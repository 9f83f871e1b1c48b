"""Checkpoint registry: list / expiry / cap eviction + resume
integration (round-2 directive #9; reference session_manager.py caps
sessions at 100 and expires them after 24h, config.py:80-81)."""

from __future__ import annotations

import os
import time

from automatic_data_validator_spark.state import Checkpointer, CheckpointRegistry


def _make_checkpoint(root: str, name: str, age_hours: float) -> str:
    ck = Checkpointer(os.path.join(root, name), snapshot_id=f"snap-{name}")
    ck.mark_done("row_rules", duration_s=1.0)
    ts = time.time() - age_hours * 3600.0
    os.utime(ck._state_path(), (ts, ts))
    return ck.root


def test_registry_lists_newest_first(tmp_path):
    root = str(tmp_path / "reg")
    _make_checkpoint(root, "old", 10.0)
    _make_checkpoint(root, "new", 1.0)
    reg = CheckpointRegistry(root)
    entries = reg.list()
    assert [e["name"] for e in entries] == ["new", "old"]
    assert entries[0]["snapshot_id"] == "snap-new"
    assert entries[0]["completed"] == ["row_rules"]


def test_registry_expires_and_caps(tmp_path):
    root = str(tmp_path / "reg2")
    _make_checkpoint(root, "ancient", 48.0)   # expired
    for i in range(4):
        _make_checkpoint(root, f"s{i}", float(i))  # fresh, ages 0..3h
    reg = CheckpointRegistry(root)
    removed = reg.cleanup(max_age_hours=24.0, max_sessions=2)
    removed_names = {os.path.basename(p) for p in removed}
    # ancient expired; s3/s2 (oldest fresh) evicted beyond cap of 2
    assert removed_names == {"ancient", "s3", "s2"}
    left = {e["name"] for e in reg.list()}
    assert left == {"s0", "s1"}
    for p in removed:
        assert not os.path.exists(p)


def test_registry_resume_roundtrip(spark, tmp_path, docs):
    """A run checkpointed under a registry child resumes (phases
    skipped), and the registry sees its state."""
    from automatic_data_validator_spark.validate import run_validation

    root = str(tmp_path / "reg3")
    reg = CheckpointRegistry(root)
    ck_dir = os.path.join(root, "jobA")
    r1 = run_validation(spark, docs, checkpoint_dir=ck_dir,
                        snapshot_id="snap-x", with_profile=False)
    n1 = r1.violations.count()
    entries = reg.list()
    assert entries and entries[0]["name"] == "jobA"
    assert "row_rules" in entries[0]["completed"]
    t0 = time.perf_counter()
    r2 = run_validation(spark, docs, checkpoint_dir=ck_dir,
                        snapshot_id="snap-x", with_profile=False)
    assert r2.violations.count() == n1
    assert time.perf_counter() - t0 < 30.0
    # cap 0 wipes everything
    reg.cleanup(max_age_hours=1000.0, max_sessions=0)
    assert reg.list() == []
