"""Worker process for the 2-process multi-host CPU test (test_distributed.py).

Usage: python multihost_worker.py <coordinator host:port> <nproc> <pid> <out.json>

Each worker joins the jax.distributed service over localhost (standing in
for DCN), builds the GLOBAL ('data','model') mesh over all processes'
devices, replicates the seeded train state, feeds only its
``host_local_batch_slice`` of the deterministic global batch through
``make_global_batch``, and runs ONE jitted train step — exactly the code
path ``train.loop.train`` takes when ``jax.process_count() > 1``. It dumps
the step metrics + an updated-param checksum so the parent test can assert
process-0 == process-1 == single-process numerics.
"""
import json
import os
import sys


def main():
    coord, nproc, pid, out_path = (
        sys.argv[1],
        int(sys.argv[2]),
        int(sys.argv[3]),
        sys.argv[4],
    )
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    os.environ.pop("PALLAS_AXON_POOL_IPS", None)

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(
        coordinator_address=coord, num_processes=nproc, process_id=pid
    )
    assert jax.process_count() == nproc

    here = os.path.dirname(os.path.abspath(__file__))
    sys.path.insert(0, os.path.dirname(here))  # repo root (the package)
    sys.path.insert(0, here)
    from test_train import tiny_batch, tiny_cfg

    from wavenet_autoencoders_tpu.models import build_model
    from wavenet_autoencoders_tpu.parallel.distributed import (
        host_local_batch_slice,
        make_global_batch,
        replicate_to_mesh,
    )
    from wavenet_autoencoders_tpu.parallel.mesh import make_mesh
    from wavenet_autoencoders_tpu.train import init_state, make_train_step

    cfg = tiny_cfg()
    mesh = make_mesh(cfg)  # data = all global devices across both processes
    model = build_model(cfg)
    state = replicate_to_mesh(init_state(cfg, model, jax.random.PRNGKey(0)), mesh)
    rng = replicate_to_mesh(jax.random.PRNGKey(2), mesh)

    B = 8
    full = tiny_batch(cfg, B=B)  # seeded: bit-identical on every host
    s, n = host_local_batch_slice(B)
    local = {k: v[s : s + n] for k, v in full.items()}
    gbatch = make_global_batch(local, mesh)
    assert gbatch["x"].shape[0] == B  # global batch reassembled

    step_fn = make_train_step(cfg, model, donate=False)
    new_state, metrics = step_fn(state, gbatch, rng)

    result = {k: float(v) for k, v in metrics.items()}
    v = new_state.params["wavenet"]["layers"][0]["conv"]["v"]
    result["updated_param_sum"] = float(jax.numpy.sum(v))  # replicated output
    result["process_count"] = jax.process_count()
    result["global_devices"] = len(jax.devices())

    # qualitative eval hooks under multi-host (VERDICT r2 item 7): process 0
    # runs them locally from its addressable shards — exactly what
    # train.loop does at checkpoint/eval cadence when process_count > 1
    if pid == 0:
        art_dir = out_path + "_artifacts"
        from wavenet_autoencoders_tpu.train.loop import (
            _addressable_batch,
            _addressable_state,
            _try_eval_model,
            _try_save_states,
        )
        from wavenet_autoencoders_tpu.train.step import make_sample_forward

        fwd_fn = make_sample_forward(cfg, model)
        lstate = _addressable_state(new_state)
        lbatch = _addressable_batch(gbatch)
        assert lbatch["x"].shape[0] == B // nproc  # this host's rows
        _try_save_states(cfg, fwd_fn, lstate, 1, lbatch, art_dir)
        _try_eval_model(cfg, model, lstate, 1, lbatch, art_dir)
        audio = os.path.join(art_dir, "intermediate", "audio")
        ev = os.path.join(art_dir, "intermediate", "train_no_dev_eval")
        result["save_states_files"] = sorted(os.listdir(audio)) if os.path.isdir(audio) else []
        result["eval_model_files"] = sorted(os.listdir(ev)) if os.path.isdir(ev) else []
    with open(out_path, "w") as f:
        json.dump(result, f)
    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
