"""Spatially sharded full-frame inference over the ``model`` mesh axis.

The SURVEY §2.7/§5 "long-context analog": the reference assumes one GPU
holds a full frame (``test_RealVSR_wo_GT.py`` full-res loop); on TPU the
natural scaling axis for 1080p+ frames is sharding H across chips with a
halo wide enough to cover the model's receptive field, so each chip's
*center* rows are bitwise what the unsharded model would compute.

Mechanism (``shard_map`` over ``Mesh(('data', 'model'))``):
  * the (B, N, H, W, C) window is replicated (a 1080p bf16 window is
    ~36 MB — cheaper to replicate than to halo-exchange activations
    through every conv of the network);
  * each device takes a uniform ``Hs + 2*halo``-row window CLAMPED inside
    the real frame (edge shards shift inward, exactly like
    ``eval/tiled.py``), runs the full model locally, and keeps its ``Hs``
    assigned rows wherever they landed in the window;
  * outputs concatenate along H via the ``P(None, 'model')`` out_spec.

Exactness: windows never extend past the frame, so true frame edges see
the model's own per-layer conv zero-padding (input-level zero rows are
NOT equivalent — the second conv would see bias rows where the unsharded
model pads zeros).  Interior window edges corrupt at most the receptive
field's width of fringe rows, all cropped while ``halo >=
receptive_field`` (see :func:`receptive_field_rows`).  The DCN reach is
bounded by the deployment clamp (±R) plus its 3x3 window, scaled by the
pyramid level.  Asserted (to float-reassociation ulp) against the unsharded forward in
``__graft_entry__.dryrun_multichip`` and tests/test_spatial.py.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def receptive_field_rows(front_RBs: int = 5, back_RBs: int = 10,
                         max_offset: int = 4) -> int:
    """Conservative half-receptive-field (rows) of EDVR/EDVRNoUp at input
    resolution, for choosing an exactness-preserving halo.

    Worst path: conv_first + front RBs (1 + 2*front px) -> L2/L3 strided
    pyramid (3px at L1 + 3x3 tails: ~9) -> PCD L3 offset convs + DCN
    (taps ±1 + clamp ±max_offset, x4 at L1 scale) -> L2/L1/cascade chains
    -> recon trunk (2*back + 4).  Rounded up to a multiple of 4 so shard
    boundaries keep the stride-4 pyramid phase.
    """
    front = 1 + 2 * front_RBs
    pyramid = 9
    pcd = 4 * (8 + (max_offset + 1)) + 2 * (4 + (max_offset + 1)) \
        + (2 + (max_offset + 1)) + (2 + (max_offset + 1))
    recon = 2 * back_RBs + 4
    rf = front + pyramid + pcd + recon
    return -(-rf // 4) * 4


def make_spatial_sharded_forward(model, params, mesh: Mesh, *,
                                 halo: int | None = None,
                                 axis: str = "model"):
    """Jitted (params, window) -> frame with H sharded over ``axis``.

    window: (B, N, H, W, C); H must divide evenly by the axis size and the
    per-shard height must be a multiple of 4 (pyramid stride phase).
    Returns the restored frame (B, H', W', C) with H' sharded on ``axis``.
    """
    n_shard = mesh.shape[axis]
    if halo is None:
        halo = receptive_field_rows(
            front_RBs=model.front_RBs, back_RBs=model.back_RBs)
    assert halo % 4 == 0, "halo must keep the stride-4 pyramid phase"

    def local_fwd(p, window):
        # window arrives replicated: (B, N, H, W, C) on every device
        b, n, h, w, c = window.shape
        hs = h // n_shard
        hw = hs + 2 * halo
        assert hs * n_shard == h and hs % 4 == 0, (h, n_shard)
        assert hw <= h, (
            f"frame of {h} rows too short for {n_shard}-way sharding with "
            f"halo {halo} (needs >= {hw}); use the unsharded forward")
        idx = jax.lax.axis_index(axis)
        # uniform window clamped inside the frame: edge shards shift
        # inward so true frame edges keep the model's own conv padding
        y0 = jnp.clip(idx * hs - halo, 0, h - hw)
        sl = jax.lax.dynamic_slice_in_dim(window, y0, hw, axis=2)
        out = model.apply({"params": p}, sl)
        scale = out.shape[1] // hw
        keep0 = (idx * hs - y0) * scale
        return jax.lax.dynamic_slice_in_dim(out, keep0, hs * scale, axis=1)

    fwd = jax.shard_map(
        local_fwd, mesh=mesh,
        in_specs=(P(), P()),
        out_specs=P(None, axis),
        check_vma=False)
    return jax.jit(fwd)
