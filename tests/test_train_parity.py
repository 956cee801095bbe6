"""Training-step parity vs a torch oracle (VERDICT r1 item 6).

Forward parity can't see BN-momentum, Adam-epsilon, or gradient-semantics
drift; this runs N optimizer steps in both frameworks from an *identical*
initialization (flax init -> to_torch -> torch load_state_dict) on identical
fp32 batches and asserts per-step loss agreement.

Setup mirrors the reference train loop (/root/reference/main.py:193-222)
with its frozen-VGG batch-stats BN quirk (model.train() keeps BN in batch
mode, model.py:57-59 — our ``--bn_mode batch``), Adam(lr) over all params
(frozen ones get no grads), mean CE loss. Dropout is disabled on BOTH sides
(the two frameworks' dropout RNGs can't be aligned); everything else runs
exactly as training does.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from vqa_tpu.models import VQABaselineNet  # noqa: E402
from vqa_tpu.models.convert import to_torch  # noqa: E402
from tests.test_torch_parity import build_torch_baseline  # noqa: E402

LR = 1e-3
N_STEPS = 10


def _batches(vocab_size, n_batches=3, B=2, L=6, size=224, seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n_batches):
        img = rng.standard_normal((B, size, size, 3)).astype(np.float32)
        ques = rng.integers(1, vocab_size, (B, L)).astype(np.int64)
        # descending lengths (torch pack_padded_sequence enforce_sorted);
        # zero out pads exactly like the reference dataset does
        lens = np.sort(rng.integers(2, L + 1, (B,)))[::-1].astype(np.int64)
        for i, n in enumerate(lens):
            ques[i, n:] = 0
        label = rng.integers(0, 3, (B,)).astype(np.int64)
        out.append((img, ques, lens, label))
    return out


def _torch_losses(model, fwd, batches):
    model.train()
    for m in model.modules():  # dropout off; BN stays in batch-stats mode
        if isinstance(m, tnn.Dropout):
            m.eval()
    for name, p in model.named_parameters():
        if name.startswith("image_encoder.vgg11_encoder."):
            p.requires_grad_(False)  # the reference's frozen backbone
    opt = torch.optim.Adam(model.parameters(), lr=LR)
    losses = []
    for step in range(N_STEPS):
        img, ques, lens, label = batches[step % len(batches)]
        logits = fwd(torch.from_numpy(img.transpose(0, 3, 1, 2).copy()),
                     torch.from_numpy(ques), torch.from_numpy(lens.copy()))
        loss = tF.cross_entropy(logits, torch.from_numpy(label))
        opt.zero_grad()
        loss.backward()
        opt.step()
        losses.append(float(loss.detach()))
    return losses


def _jax_losses(net, variables, batches):
    params, batch_stats = variables["params"], variables["batch_stats"]
    tx = optax.adam(LR)
    opt_state = tx.init(params)

    def loss_fn(params, stats, img, ques, lens, label):
        # train=False (no dropout) + batch-stats BN == torch setup above
        logits, updates = net.apply(
            {"params": params, "batch_stats": stats}, img, ques, lens,
            train=False, use_running_stats=False, mutable=["batch_stats"])
        loss = optax.softmax_cross_entropy_with_integer_labels(
            logits.astype(jnp.float32), label).mean()
        return loss, updates["batch_stats"]

    step_fn = jax.jit(jax.value_and_grad(loss_fn, has_aux=True))
    losses = []
    for step in range(N_STEPS):
        img, ques, lens, label = batches[step % len(batches)]
        (loss, batch_stats), grads = step_fn(
            params, batch_stats, jnp.asarray(img), jnp.asarray(ques),
            jnp.asarray(lens.copy()), jnp.asarray(label))
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        losses.append(float(loss))
    return losses


@pytest.mark.slow
def test_baseline_train_step_parity():
    V, K = 30, 4
    net = VQABaselineNet(vocab_size=V, K=K)
    batches = _batches(V)
    img, ques, lens, _ = batches[0]
    variables = net.init({"params": jax.random.PRNGKey(0)},
                         jnp.asarray(img[:1]), jnp.asarray(ques[:1]),
                         jnp.asarray(lens[:1].copy()))

    # identical start: flax init -> reference-format .pth dict -> torch oracle
    sd = to_torch("baseline", variables["params"], variables["batch_stats"])
    model, fwd = build_torch_baseline(V, K)
    model.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                           for k, v in sd.items()}, strict=True)

    torch_losses = _torch_losses(model, fwd, batches)
    jax_losses = _jax_losses(net, variables, batches)

    # fp32 drift compounds across steps; ~1e-3 agreement catches optimizer/
    # BN-semantics divergence while tolerating accumulation-order noise
    np.testing.assert_allclose(jax_losses, torch_losses, rtol=2e-3, atol=2e-3,
                               err_msg=f"jax={jax_losses}\ntorch={torch_losses}")
    # sanity: training actually moved the loss
    assert torch_losses[0] != torch_losses[-1]
