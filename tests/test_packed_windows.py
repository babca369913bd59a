"""Packed ("compressed") window layout for window-padded stages.

Covers the trace-time bin-packing geometry and the fused packed block path
against the padded unfused oracle (both mask pad tokens out of attention —
the documented deviation from the reference's pad-leak,
swin_transformer_3d.py:457-461 + 463-492).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vsn_tpu.models.swin3d import (
    BasicLayer3D,
    packed_window_layout,
    packed_window_onehots,
    packing_profitable,
    padded_window_region_ids,
)
from tests.test_swin_block_kernels import _ForceTpu


STAGE3 = ((9, 11, 9), (6, 7, 6))


def _attend_oracle(dims, window, shift):
    """[L, L] bool: which real-token pairs may attend, from the padded-grid
    formulation (true window grouping + region ids, pads = -1)."""
    d, h, w = dims
    ids = padded_window_region_ids(dims, window, shift)  # [nW, N]
    n = ids.shape[1]
    # map each padded-grid slot back to its source flat index (rolled grid)
    from vsn_tpu.models.swin3d import _rolled_grid

    real, flat_src, _, _, _ = _rolled_grid(dims, window, shift)
    l = d * h * w
    may = np.zeros((l, l), bool)
    # iterate true windows via the same partition padded ids use; same
    # window + same region id => attend
    wd, wh, ww = window
    dp, hp, wp = real.shape
    src_part = flat_src.reshape(dp // wd, wd, hp // wh, wh, wp // ww, ww)
    src_part = src_part.transpose(0, 2, 4, 1, 3, 5).reshape(-1, n)
    real_part = real.reshape(dp // wd, wd, hp // wh, wh, wp // ww, ww)
    real_part = real_part.transpose(0, 2, 4, 1, 3, 5).reshape(-1, n)
    for wi in range(ids.shape[0]):
        for a in range(n):
            if not real_part[wi, a]:
                continue
            for b in range(n):
                if not real_part[wi, b]:
                    continue
                if ids[wi, a] == ids[wi, b]:
                    may[src_part[wi, a], src_part[wi, b]] = True
    return may


@pytest.mark.parametrize("shift", [(0, 0, 0), (3, 3, 3)])
def test_packed_layout_invariants_stage3(shift):
    dims, window = STAGE3
    n = window[0] * window[1] * window[2]
    lay = packed_window_layout(dims, window, shift)
    v = lay.perm.shape[0]
    assert v == 4  # ceil(891 / 252)

    real_slots = lay.perm[lay.perm >= 0]
    l = dims[0] * dims[1] * dims[2]
    # every real token exactly once
    assert sorted(real_slots.tolist()) == list(range(l))
    # pad slots are consistently -1 across all three arrays
    np.testing.assert_array_equal(lay.perm < 0, lay.winpos < 0)
    np.testing.assert_array_equal(lay.perm < 0, lay.ids < 0)
    # winpos is a valid in-window position
    assert lay.winpos.max() < n

    # attention coverage: same-chunk same-id pairs == padded-path pairs
    may = np.zeros((l, l), bool)
    for c in range(v):
        for a in range(n):
            if lay.perm[c, a] < 0:
                continue
            same = (lay.ids[c] == lay.ids[c, a]) & (lay.perm[c] >= 0)
            may[lay.perm[c, a], lay.perm[c][same]] = True
    np.testing.assert_array_equal(may, _attend_oracle(dims, window, shift))


def test_packed_onehots_roundtrip():
    dims, window = STAGE3
    p, s = packed_window_onehots(dims, window, (3, 3, 3))
    l = dims[0] * dims[1] * dims[2]
    x = np.random.default_rng(0).standard_normal((2, l, 5)).astype(np.float32)
    packed = np.einsum("vnl,blc->vbnc", p, x)
    back = np.einsum("vnl,vbnc->blc", p, packed)
    np.testing.assert_allclose(back, x, rtol=0, atol=0)
    # S rows are one-hot exactly where perm is real
    lay = packed_window_layout(dims, window, (3, 3, 3))
    np.testing.assert_array_equal(s.sum(-1), (lay.perm >= 0).astype(np.float32))


def test_packing_profitability_gate():
    assert packing_profitable(*STAGE3)
    assert packing_profitable((5, 5, 5), (2, 2, 2))
    assert packing_profitable((4, 4, 3), (2, 2, 2))  # packs perfectly (V=6)
    assert not packing_profitable((4, 4, 4), (2, 2, 2))  # divides evenly
    assert not packing_profitable((2, 2, 3), (2, 2, 2))  # too little waste


def _layer(use_pallas, use_checkpoint=False):
    return BasicLayer3D(
        depth=2, num_heads=2, window=(2, 2, 2),
        drop_path_rates=[0.0, 0.0], downsample=False,
        mlp_ratio=2.0, use_pallas=use_pallas, use_checkpoint=use_checkpoint,
    )


@pytest.mark.parametrize("dims,use_checkpoint", [
    ((5, 5, 5), False),   # packed path (waste 216/128 = 1.69)
    ((5, 5, 5), True),    # packed under nn.remat
    ((4, 4, 3), False),   # packed path with zero pad slots (perfect fit)
    ((2, 2, 3), False),   # padded fused path with -1 pad ids
])
def test_padded_stage_fused_matches_unfused(dims, use_checkpoint):
    c = 8
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((2, *dims, c)), jnp.float32)

    ref_layer = _layer(False)
    variables = ref_layer.init(jax.random.key(0), x, True)
    out_ref = ref_layer.apply(variables, x, True)

    def loss_ref(p):
        return (ref_layer.apply({"params": p}, x, True) ** 2).sum()

    g_ref = jax.grad(loss_ref)(variables["params"])

    with _ForceTpu():
        layer = _layer(True, use_checkpoint)
        v_fused = layer.init(jax.random.key(0), x, True)
        assert jax.tree.structure(v_fused) == jax.tree.structure(variables)
        out = layer.apply(variables, x, True)

        def loss(p):
            return (layer.apply({"params": p}, x, True) ** 2).sum()

        g = jax.grad(loss)(variables["params"])

    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref),
                               rtol=1e-4, atol=1e-4)
    flat_r = dict(jax.tree.leaves_with_path(g_ref))
    for path, leaf in jax.tree.leaves_with_path(g):
        np.testing.assert_allclose(
            np.asarray(leaf), np.asarray(flat_r[path]),
            rtol=2e-3, atol=2e-3, err_msg=str(path),
        )
