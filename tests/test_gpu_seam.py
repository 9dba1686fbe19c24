"""GPU-swap seam (SURVEY §10.5): the documented numpy→torch swap keeps
the tagger's OWN recurrence equations and re-expresses them in torch
ops (GPU matmuls) — it does NOT adopt ``torch.nn.GRU``, whose CuDNN
variant applies the reset gate AFTER the hidden matmul
(``r*(W_hn h)``) while the tagger uses the original Cho formulation
(``(r*h) @ U_c``); no weight mapping equates the two.

``_torch_gru_like_tagger`` below IS the swap: a line-for-line torch
transliteration of ``state.tagger._gru_forward`` (mask semantics
included). The test runs it against the numpy forward when torch is
importable and skips otherwise — green on any torch box, honest here.
"""

from __future__ import annotations

import numpy as np
import pytest

from autoner_ray.state.tagger import _gru_forward


def _torch_gru_like_tagger(torch, x, W, U, b, mask, reverse=False):
    """torch transliteration of ``_gru_forward`` (same equations, same
    gate stack [z, r, c], same masked pass-through). Runs on whatever
    device the input tensors live on — this is the CPU/GPU seam."""
    T, B, _ = x.shape
    H = U.shape[0]
    h = torch.zeros((T, B, H), dtype=x.dtype, device=x.device)
    hp = torch.zeros((B, H), dtype=x.dtype, device=x.device)
    steps = range(T - 1, -1, -1) if reverse else range(T)
    pre = x @ W + b  # (T,B,3H)
    for t in steps:
        zr = pre[t][:, : 2 * H] + hp @ U[:, : 2 * H]
        z = torch.sigmoid(zr[:, :H])
        r = torch.sigmoid(zr[:, H:])
        c_in = pre[t][:, 2 * H :] + (r * hp) @ U[:, 2 * H :]
        c = torch.tanh(c_in)
        m = mask[t][:, None]
        ht = m * ((1 - z) * hp + z * c) + (1 - m) * hp
        h[t] = ht
        hp = ht
    return h


def _random_case(seed=0, T=6, B=3, D=5, H=4):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((T, B, D)).astype(np.float32)
    W = (rng.standard_normal((D, 3 * H)) * 0.5).astype(np.float32)
    U = (rng.standard_normal((H, 3 * H)) * 0.5).astype(np.float32)
    b = (rng.standard_normal(3 * H) * 0.1).astype(np.float32)
    # ragged batch: column 0 full length, column 1 short, column 2 shorter
    mask = np.ones((T, B), np.float32)
    mask[4:, 1] = 0.0
    mask[2:, 2] = 0.0
    return x, W, U, b, mask


@pytest.mark.parametrize("reverse", [False, True])
def test_gru_forward_equals_torch_transliteration(reverse):
    torch = pytest.importorskip("torch")

    x, W, U, b, mask = _random_case(seed=7)
    ours, _ = _gru_forward(x, W, U, b, mask, reverse=reverse)

    device = "cuda" if torch.cuda.is_available() else "cpu"
    tt = {
        k: torch.from_numpy(v).to(device)
        for k, v in {"x": x, "W": W, "U": U, "b": b, "mask": mask}.items()
    }
    theirs = _torch_gru_like_tagger(
        torch, tt["x"], tt["W"], tt["U"], tt["b"], tt["mask"],
        reverse=reverse,
    )
    np.testing.assert_allclose(
        ours, theirs.cpu().numpy(), rtol=1e-4, atol=1e-5
    )
