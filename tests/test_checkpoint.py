"""Checkpoint/resume subsystem tests."""

import numpy as np

import jax

from s2sr_tpu.server.persistence import DurableJobStore
from s2sr_tpu.training.checkpoint import CheckpointManager
from s2sr_tpu.training.train import TrainConfig, init_training, make_train_step

TINY = TrainConfig(num_feat=8, num_block=1, num_grow_ch=4, scale=2,
                   dtype="float32")


def test_training_checkpoint_roundtrip(tmp_path):
    params, opt_state = init_training(TINY)
    step_fn, _ = make_train_step(TINY)
    rng = np.random.default_rng(0)
    lr = rng.random((2, 8, 8, 3), np.float32)
    hr = rng.random((2, 16, 16, 3), np.float32)
    params, opt_state, _ = step_fn(params, opt_state, lr, hr)

    mgr = CheckpointManager(tmp_path / "ckpt")
    mgr.save(1, params, opt_state)
    mgr.wait()

    params2, opt2 = init_training(TINY, seed=99)
    restored_p, restored_o, step = mgr.restore(params2, opt2)
    assert step == 1
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(restored_p)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and training continues from the restored state
    p3, o3, loss = step_fn(restored_p, restored_o, lr, hr)
    assert np.isfinite(float(loss))
    mgr.close()


def test_durable_job_store_replay(tmp_path):
    journal = tmp_path / "jobs.jsonl"
    store = DurableJobStore(journal)
    store.create("job_a", status="queued", message="q")
    store.update("job_a", status="processing", message="working")
    store.create("job_b", status="queued", message="q")
    store.update("job_b", status="completed", message="done",
                 result={"ok": True})

    # fresh process: replay the journal
    store2 = DurableJobStore(journal)
    job_a = store2.get("job_a")
    job_b = store2.get("job_b")
    # in-flight job marked failed on restart; completed one preserved
    assert job_a["status"] == "failed"
    assert "restart" in job_a["message"]
    assert job_b["status"] == "completed"
    assert job_b["result"] == {"ok": True}


def test_durable_job_store_compacts_on_boot(tmp_path):
    """The journal appends one record per update forever; boot must
    compact it to one merged record per job (atomically) — including
    the failed-on-restart marking — and keep journaling afterwards."""
    journal = tmp_path / "jobs.jsonl"
    store = DurableJobStore(journal)
    for i in range(5):
        store.create(f"job_{i}", status="queued", message="q")
        store.update(f"job_{i}", status="processing", message="working")
        if i % 2 == 0:
            store.update(f"job_{i}", status="completed", message="done")
    lines_before = len(journal.read_text().splitlines())
    assert lines_before == 13          # 5 creates + 8 updates

    store2 = DurableJobStore(journal)
    lines_after = len(journal.read_text().splitlines())
    assert lines_after == 5            # one merged record per job
    assert store2.get("job_0")["status"] == "completed"
    assert store2.get("job_1")["status"] == "failed"      # interrupted
    assert "restart" in store2.get("job_1")["message"]
    # and no stale tmp file is left behind
    assert not (tmp_path / "jobs.jsonl.tmp").exists()

    # journaling continues after compaction
    store2.create("job_new", status="queued", message="q")
    assert len(journal.read_text().splitlines()) == 6
    store3 = DurableJobStore(journal)
    assert store3.get("job_new")["status"] == "failed"    # was queued
    assert store3.get("job_0")["status"] == "completed"
