from .oracle import OracleScene, oracle_scene_from, trace_sample_oracle, render_oracle
