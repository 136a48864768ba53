"""Multi-host (DCN) data-parallel tests — VERDICT r1 item #2.

The reference is strictly single-host (``vqwae_train.py:698-706``); the TPU
framework must scale data-parallel across hosts (SURVEY.md §2.6). Two
layers of proof:

1. single-process: the host-slice + ``make_array_from_process_local_data``
   assembly path reproduces the plain ``shard_batch`` step numerics;
2. a REAL 2-process run over the jax.distributed service on localhost
   (CPU backend, 2 virtual devices per process = 4 global) reproduces the
   single-process loss / grad-norm / updated-param numerics bit-for-bit in
   spirit (rtol 2e-3, same as the DP/TP parity tests).
"""
import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import jax
import numpy as np
import pytest

from wavenet_autoencoders_tpu.models import build_model
from wavenet_autoencoders_tpu.parallel.distributed import (
    host_local_batch_slice,
    make_global_batch,
    replicate_to_mesh,
)
from wavenet_autoencoders_tpu.parallel.mesh import make_mesh, shard_batch, shard_state
from wavenet_autoencoders_tpu.train import init_state, make_train_step

from test_train import tiny_batch, tiny_cfg


def test_host_local_batch_slice_single_process():
    s, n = host_local_batch_slice(8)
    assert (s, n) == (0, 8)  # one process owns the whole batch


def test_make_global_batch_matches_shard_batch_numerics():
    """Single-process: assembling the global batch from the 'host-local'
    slice must reproduce the device_put path exactly."""
    cfg = tiny_cfg()
    model = build_model(cfg)
    mesh = make_mesh(cfg)  # data=8 over the simulated CPU devices
    step_fn = make_train_step(cfg, model, donate=False)
    batch = tiny_batch(cfg, B=8)
    rng = jax.random.PRNGKey(2)

    s1 = shard_state(init_state(cfg, model, jax.random.PRNGKey(0)), mesh)
    _, m_ref = step_fn(s1, shard_batch(batch, mesh), rng)

    s2 = replicate_to_mesh(init_state(cfg, model, jax.random.PRNGKey(0)), mesh)
    s, n = host_local_batch_slice(8)
    local = {k: v[s : s + n] for k, v in batch.items()}
    gb = make_global_batch(local, mesh)
    assert gb["x"].shape == batch["x"].shape
    _, m_global = step_fn(s2, gb, rng)

    for k in ("loss", "grad_norm", "aux_loss"):
        np.testing.assert_allclose(
            float(m_ref[k]), float(m_global[k]), rtol=1e-5, err_msg=k
        )


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_step_matches_single_process(tmp_path):
    """Launch a REAL jax.distributed 2-process run (localhost coordinator,
    CPU backend) and require identical step numerics at
    process_count ∈ {1, 2} — the multi-host 'done' criterion of VERDICT #2."""
    port = _free_port()
    outs = [tmp_path / f"proc{i}.json" for i in range(2)]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    worker = Path(__file__).with_name("multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), f"127.0.0.1:{port}", "2", str(i), str(outs[i])],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    r0 = json.loads(outs[0].read_text())
    r1 = json.loads(outs[1].read_text())
    assert r0["process_count"] == 2 and r0["global_devices"] == 4

    # both controllers observe the identical replicated result
    for k in ("loss", "grad_norm", "updated_param_sum"):
        np.testing.assert_allclose(r0[k], r1[k], rtol=1e-6, err_msg=k)

    # single-process reference numerics on the same batch/rng/seeds
    cfg = tiny_cfg()
    model = build_model(cfg)
    step_fn = make_train_step(cfg, model, donate=False)
    state = init_state(cfg, model, jax.random.PRNGKey(0))
    new_state, m = step_fn(state, tiny_batch(cfg, B=8), jax.random.PRNGKey(2))
    np.testing.assert_allclose(float(m["loss"]), r0["loss"], rtol=2e-3)
    np.testing.assert_allclose(float(m["grad_norm"]), r0["grad_norm"], rtol=2e-3)
    psum = float(np.sum(np.asarray(new_state.params["wavenet"]["layers"][0]["conv"]["v"])))
    np.testing.assert_allclose(psum, r0["updated_param_sum"], rtol=2e-3, atol=1e-6)


def test_two_process_run_writes_eval_artifacts(tmp_path):
    """Multi-host qualitative eval (VERDICT r2 item 7): process 0 must
    write save_states audio + eval_model AR artifacts from its addressable
    shards; covered by the same 2-process worker (it records the produced
    file lists)."""
    port = _free_port()
    outs = [tmp_path / f"proc{i}.json" for i in range(2)]
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    worker = Path(__file__).with_name("multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), f"127.0.0.1:{port}", "2", str(i), str(outs[i])],
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
        )
        for i in range(2)
    ]
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("multi-host worker timed out")
        logs.append(out.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    r0 = json.loads(outs[0].read_text())
    # teacher-forced dump: predicted + target wavs (eval_hooks.save_states)
    assert any("predicted" in f for f in r0["save_states_files"]), r0
    assert any("target" in f for f in r0["save_states_files"]), r0
    # AR decode artifacts (eval_hooks.eval_model)
    assert r0["eval_model_files"], r0
