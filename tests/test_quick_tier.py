"""Quick-tier coverage meta-tests.

The quick tier (``pytest -m quick``) claims to touch every subsystem in
under ~4 minutes.  That claim rots in two ways: a NEW test file lands
with no quick representative (nothing fails), or a curated QUICK_TESTS
entry goes stale after a rename (the conftest drift guard catches that
one at collection time).  This file pins the first failure mode.
"""

from pathlib import Path

from conftest import QUICK_FILES, QUICK_TESTS, WAIVED_QUICK

TESTS_DIR = Path(__file__).resolve().parent


def test_every_file_has_quick_representation():
    """Every tests/test_*.py contributes >=1 quick test or is waived."""
    quick_files = set(QUICK_FILES)
    quick_test_files = {f for (f, _) in QUICK_TESTS}
    missing = []
    for p in sorted(TESTS_DIR.glob("test_*.py")):
        name = p.name
        if (name not in quick_files and name not in quick_test_files
                and name not in WAIVED_QUICK):
            missing.append(name)
    assert not missing, (
        "test files with no quick-tier representation and no waiver in "
        f"tests/conftest.py: {missing} — add a quick representative to "
        "QUICK_TESTS (or QUICK_FILES) or waive it with a reason.")


def test_waivers_reference_real_files():
    """A waiver for a deleted file is dead weight — prune it."""
    ghosts = sorted(w for w in WAIVED_QUICK
                    if not (TESTS_DIR / w).is_file())
    assert not ghosts, f"WAIVED_QUICK names missing files: {ghosts}"


def test_quick_entries_reference_real_files():
    """Every QUICK_FILES / QUICK_TESTS file must exist on disk.

    The conftest drift guard only fires when the file IS collected; a
    wholesale file deletion would otherwise leave silent dead entries.
    """
    ghosts = sorted(
        {f for f in QUICK_FILES if not (TESTS_DIR / f).is_file()}
        | {f for (f, _) in QUICK_TESTS if not (TESTS_DIR / f).is_file()})
    assert not ghosts, f"quick-tier entries name missing files: {ghosts}"
