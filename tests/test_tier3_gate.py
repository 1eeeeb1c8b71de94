"""Tier-3 regression gate (reference: bag-replay CI stage,
test/CMakeLists.txt:120-168) on the committed synthetic drive —
compare_pose.cpp:89-98 position + 3-sigma gates AND the
compare_tf.cpp:84-85 TF-agreement gate, via the same code path
``tools/run_tier3.py`` uses.  The full 50-step x {imu, no-imu} result
is stored in docs/TIER3_GATE.json; this test runs a 25-step slice to
keep suite time bounded."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def test_tier3_gate_with_imu():
    from tools.make_tier3_log import build_log
    from tools.run_tier3 import run_gate

    log = build_log(n_steps=25)
    res = run_gate(log, use_imu=True)
    assert res["pose_violations"] == 0, res
    assert res["tf_violations"] == 0, res
    assert res["max_error_m"] <= 0.3 and res["max_tf_diff_m"] <= 0.05, res
