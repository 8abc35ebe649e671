"""Tests for the tracker, logging, and profiling utilities (no jax compile)."""

import csv
import logging
import os

from soft_intro_vae_tpu.utils.logging import setup_logging
from soft_intro_vae_tpu.utils.tracker import LossTracker, RunningMean


class TestRunningMean:
    def test_mean_and_reset(self):
        rm = RunningMean()
        for v in (1.0, 2.0, 3.0):
            rm.add(v)
        assert rm.mean() == 2.0
        rm.reset()
        assert rm.mean() == 0.0


class TestLossTracker:
    def test_csv_rows_and_history(self, tmp_path):
        t = LossTracker(str(tmp_path))
        for epoch in range(3):
            for i in range(4):
                t.update({"loss": float(epoch * 4 + i), "kl": 1.0})
            t.register_means(epoch)
        with open(tmp_path / "log.csv") as f:
            rows = list(csv.reader(f))
        assert rows[0] == ["epoch", "loss", "kl"]
        assert len(rows) == 4
        assert float(rows[1][1]) == 1.5  # mean of 0..3
        assert t.history["kl"] == [1.0, 1.0, 1.0]

    def test_late_series_padded(self, tmp_path):
        t = LossTracker(str(tmp_path))
        t.update({"a": 1.0})
        t.register_means(0)
        t.update({"a": 2.0, "b": 5.0})
        t.register_means(1)
        assert len(t.history["b"]) == 2  # front-padded

    def test_state_dict_roundtrip(self, tmp_path):
        t = LossTracker(str(tmp_path))
        t.update({"x": 3.0})
        t.register_means(0)
        sd = t.state_dict()
        t2 = LossTracker(str(tmp_path))
        t2.load_state_dict(sd)
        assert t2.history == t.history and t2.epochs == t.epochs


class TestLogging:
    def test_file_and_console_handlers(self, tmp_path):
        log = setup_logging(str(tmp_path), name="sivae-test")
        log.info("hello world")
        for h in log.handlers:
            h.flush()
        content = open(tmp_path / "log.txt").read()
        assert "hello world" in content
        assert len(log.handlers) == 2

    def test_idempotent_setup(self, tmp_path):
        setup_logging(str(tmp_path), name="sivae-test2")
        log = setup_logging(str(tmp_path), name="sivae-test2")
        assert len(log.handlers) == 2  # no handler duplication
