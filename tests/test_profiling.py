"""Throughput tracker tests."""

import json
import time

from sph3d_gcn_tpu.train.profiling import ThroughputTracker


def test_throughput_tracker():
    t = ThroughputTracker(points_per_batch=1000, num_chips=2)
    for _ in range(3):
        with t.step():
            time.sleep(0.01)
    assert t.steps == 3
    assert t.ms_per_step >= 10
    assert 0 < t.points_per_sec_per_chip < 1000 / 0.01
    line = json.loads(t.json_line("test", baseline=100.0))
    assert line["unit"] == "points/sec/chip"
    assert "vs_baseline" in line
