"""Drive the remote-UI path against a live TPU render and measure it.

The UI protocol is fully covered by tests/test_ui.py on localhost, but
those drive a fake render loop on CPU.  This probe exercises the real
production stack end-to-end on hardware — CLI subprocess holding the
TPU, InterfaceServer inside its render loop, InterfaceClient over TCP —
and measures what an interactive user actually gets through the remote
tunnel (reference interaction model: src/InterfaceServer.hpp:110-166 +
src/PathTracerApp.cpp:652-686):

  * preview frame rate + bytes while rendering
  * a no-restart tonemap change (exposure) mid-render
  * a restart change (env rotation) mid-render
  * clean remote stop; the partial image must still be saved

Run (needs the TPU; takes ~2-3 min incl. compile):
    python scripts/ui_tpu_probe.py

Prints one summary line per phase; exits non-zero on any failure.
"""

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ipu_path_trace_tpu.ui.client import InterfaceClient  # noqa: E402

PORT = int(os.environ.get("UI_PROBE_PORT", "5179"))
W = H = int(os.environ.get("UI_PROBE_SIZE", "512"))
# 1 = drive the --device-film interactive mode (on-device tonemap, only
# LDR bytes cross per step) instead of the step-wise worklist loop:
DEVICE_FILM = os.environ.get("UI_PROBE_DEVICE_FILM", "") == "1"
# 1 = add --denoise: with DEVICE_FILM the previews are filtered ON
# DEVICE (_device_preview_denoised); without, host-side.
DENOISE = os.environ.get("UI_PROBE_DENOISE", "") == "1"


def main() -> int:
    outdir = tempfile.mkdtemp(prefix="ui_probe_")
    out = os.path.join(outdir, "probe.png")
    cmd = [
        sys.executable, "-m", "ipu_path_trace_tpu.runtime.cli",
        "-w", str(W), "-H", str(H), "-s", "200000",
        "--samples-per-step", "100", "--interactive-samples", "8",
        "--assets", os.path.join(REPO, "assets", "nif_w192e16"),
        "--ui-port", str(PORT), "-o", out,
    ]
    if DEVICE_FILM:
        cmd.append("--device-film")
    if DENOISE:
        cmd.append("--denoise")
    proc = subprocess.Popen(cmd, stdout=subprocess.DEVNULL,
                            stderr=subprocess.STDOUT)
    client = None
    try:
        # The server opens its port before compiling; connect with retry.
        deadline = time.monotonic() + 60
        while True:
            try:
                client = InterfaceClient("127.0.0.1", PORT, timeout=5)
                break
            except OSError:
                if time.monotonic() > deadline:
                    raise
                time.sleep(0.5)
        print(f"[probe] connected to render server on :{PORT}")

        # Phase 1: wait for first preview (includes jit compile), then
        # measure the steady preview rate over a fixed window.
        t0 = time.monotonic()
        while not client.preview_frames:
            if proc.poll() is not None:
                print("[probe] FAIL: render process exited early")
                return 1
            if time.monotonic() - t0 > 600:
                print("[probe] FAIL: no preview within 600s")
                return 1
            time.sleep(0.2)
        first_latency = time.monotonic() - t0
        n0, b0 = client.preview_count, client.preview_bytes
        window = 20.0
        time.sleep(window)
        frames = client.preview_count - n0
        mb = (client.preview_bytes - b0) / 1e6
        print(json.dumps({
            "phase": "preview", "first_frame_s": round(first_latency, 1),
            "fps": round(frames / window, 2),
            "MB_per_s": round(mb / window, 3),
            "progress": round(client.progress, 4),
            "Mpaths_per_s": round(client.path_rate / 1e6, 1),
        }))
        if frames == 0:
            print("[probe] FAIL: no frames in measurement window")
            return 1

        # Phase 2: exposure is a tonemap-only change - previews must
        # keep flowing and progress must NOT reset (no restart).
        p_before = client.progress
        client.set_exposure(1.0)
        n1 = client.preview_count
        time.sleep(5)
        ok_exposure = client.preview_count > n1 and client.progress >= p_before
        print(json.dumps({"phase": "exposure_no_restart", "ok": ok_exposure,
                          "progress_before": round(p_before, 4),
                          "progress_after": round(client.progress, 4)}))

        # Phase 3: env rotation restarts the accumulator - progress must
        # drop back and previews keep flowing.
        client.set_env_rotation(90.0)
        t1 = time.monotonic()
        restarted = False
        while time.monotonic() - t1 < 60:
            if client.progress < p_before:
                restarted = True
                break
            time.sleep(0.2)
        print(json.dumps({"phase": "env_rotation_restart", "ok": restarted,
                          "progress_after": round(client.progress, 4)}))

        # Phase 4: live NIF hot-swap (load_nif channel) - env reload +
        # restart + jit re-specialisation for the new weight shapes
        # (reference: PathTracerApp.cpp:548-557).  Previews must resume
        # with the swapped environment.
        alt = os.path.join(REPO, "assets", "nif_w256e16")
        p_swap = client.progress
        client.load_nif(alt)
        n2 = client.preview_count
        t2 = time.monotonic()
        swap_restarted = False
        swapped = False
        while time.monotonic() - t2 < 300:
            if proc.poll() is not None:
                print("[probe] FAIL: render process died during NIF swap")
                return 1
            # The swap must actually take effect (restart resets the
            # accumulator, so progress drops) - previews resuming alone
            # would also pass if load_nif were silently dropped:
            if client.progress < p_swap:
                swap_restarted = True
            if swap_restarted and client.preview_count > n2 + 1:
                swapped = True
                break
            time.sleep(0.5)
        print(json.dumps({"phase": "load_nif_hot_swap", "ok": swapped,
                          "restart_seen": swap_restarted,
                          "resume_latency_s": round(time.monotonic() - t2, 1)}))

        # Phase 5: remote stop; the app must exit cleanly and still save
        # the partial image.
        client.stop_render()
        rc = proc.wait(timeout=180)
        saved = os.path.exists(out)
        print(json.dumps({"phase": "remote_stop", "exit_code": rc,
                          "image_saved": saved, "outfile": out}))
        return 0 if (rc == 0 and saved and ok_exposure and restarted
                     and swapped) else 1
    finally:
        if client is not None:
            client.close()
        if proc.poll() is None:
            proc.terminate()
            try:
                proc.wait(timeout=30)
            except subprocess.TimeoutExpired:
                proc.kill()


if __name__ == "__main__":
    sys.exit(main())
