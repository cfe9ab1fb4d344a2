"""Profiler window + throughput counters (training/profiling.py)."""

import glob
import time

import conftest  # noqa: F401

from smart_nar_fast_tts_tpu.training.profiling import StepProfiler, Throughput


class TestStepProfiler:
    def test_disabled_by_default(self, tmp_path):
        p = StepProfiler(str(tmp_path), start_step=0)
        for s in range(1, 5):
            p.step(s)
        p.close()
        assert glob.glob(str(tmp_path / "profile" / "**"),
                         recursive=True) == []

    def test_trace_window_written(self, tmp_path):
        p = StepProfiler(str(tmp_path), start_step=2, num_steps=2)
        for s in range(1, 7):
            p.step(s)
        p.close()
        files = glob.glob(str(tmp_path / "profile" / "**" / "*"),
                          recursive=True)
        assert files, "no trace artifacts written"

    def test_close_stops_dangling_trace(self, tmp_path):
        p = StepProfiler(str(tmp_path), start_step=1, num_steps=100)
        p.step(1)      # armed, never reaches stop step
        p.close()      # must not leave the profiler running
        assert not p._active


class TestThroughput:
    def test_first_step_excluded(self):
        t = Throughput()
        t.update(100)
        assert t.snapshot() is None

    def test_rates(self):
        t = Throughput()
        t.update(100)              # warmup (compile step)
        time.sleep(0.01)
        t.update(100)
        t.update(100)
        rates = t.snapshot()
        assert rates["steps_per_sec"] > 0
        assert rates["mel_frames_per_sec_per_chip"] > 0
        # counters reset after snapshot
        assert t.snapshot() is None
