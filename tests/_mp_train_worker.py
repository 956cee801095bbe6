"""Worker process for tests/test_multiprocess.py — real multi-host DP.

Each of two OS processes owns 4 simulated CPU devices; together they form
the 8-device global mesh. The worker runs the framework's actual
multi-host path end to end: ``initialize_distributed`` (gloo collectives)
-> ``host_shard`` -> per-host local batch -> ``shard_batch`` (cross-process
global array assembly) -> ``replicate_to_mesh`` -> one real
``make_train_step`` whose global-mean loss forces a cross-process gradient
psum. It writes ``loss_step1 loss_step2`` to ``out_path`` for the parent
test to compare across processes and against a single-process oracle.

Usage: python _mp_train_worker.py <port> <pid> <nprocs> <out_path>
"""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=4")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_cpu_collectives_implementation", "gloo")


def global_batch(batch_size: int, vocab: int, classes: int):
    """Deterministic global batch, identical in every process."""
    import jax.numpy as jnp

    rng = jax.random.PRNGKey(7)
    img = jax.random.normal(rng, (batch_size, 32, 32, 3), jnp.float32)
    ques = jax.random.randint(rng, (batch_size, 5), 1, vocab)
    lens = jnp.full((batch_size,), 5, jnp.int32)
    labels = jax.random.randint(rng, (batch_size,), 0, classes)
    return {"image": img, "question": ques, "ques_len": lens, "label": labels}


def run_steps(batch_local_or_global, mesh=None, n_steps: int = 2):
    """Build state/step and run n steps; returns the per-step losses."""
    from vqa_tpu.models import VQABaselineNet
    from vqa_tpu.parallel.mesh import replicate_to_mesh, shard_batch
    from vqa_tpu.train.state import create_train_state, make_optimizer
    from vqa_tpu.train.steps import make_train_step

    model = VQABaselineNet(vocab_size=16, K=3)
    batch = batch_local_or_global
    init = {"image": batch["image"][:1], "question": batch["question"][:1],
            "ques_len": batch["ques_len"][:1]}
    state = create_train_state(model, jax.random.PRNGKey(0), init, 1e-3)
    tx = make_optimizer(1e-3, state.params, False)
    step = make_train_step(model, tx, donate=False)
    if mesh is not None:
        state = replicate_to_mesh(state, mesh)
        batch = shard_batch(batch, mesh)
    losses = []
    for _ in range(n_steps):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    return losses


def main():
    port, pid, nprocs, out_path = (int(sys.argv[1]), int(sys.argv[2]),
                                   int(sys.argv[3]), sys.argv[4])
    from vqa_tpu.parallel.distributed import host_shard, initialize_distributed

    initialize_distributed(f"localhost:{port}", nprocs, pid)
    assert jax.process_count() == nprocs, jax.process_count()
    assert host_shard() == (pid, nprocs), host_shard()
    assert len(jax.devices()) == 4 * nprocs
    assert len(jax.local_devices()) == 4

    from vqa_tpu.parallel.mesh import get_mesh

    mesh = get_mesh()  # all global devices
    full = global_batch(16, 16, 3)
    half = 16 // nprocs
    # this process's rows = the slots its addressable devices own in the
    # process-major global device order (what its DataLoader shard feeds)
    import numpy as np
    local = {k: np.asarray(v)[pid * half:(pid + 1) * half]
             for k, v in full.items()}
    losses = run_steps(local, mesh=mesh)
    with open(out_path, "w") as f:
        f.write(" ".join(f"{v:.8f}" for v in losses))


if __name__ == "__main__":
    main()
