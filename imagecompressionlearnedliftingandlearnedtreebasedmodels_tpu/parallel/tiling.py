"""Spatially tiled high-res encode + halo-exchange lifting.

The reference is single-GPU and resolution-agnostic only up to memory
(SURVEY.md section 5 "long-context" analog). For 2K/4K encode on a mesh this
module provides two TPU-native mechanisms:

1. **Overlapped tiling** (:func:`tile_image` / :func:`untile_image` /
   :func:`make_tiled_eval_step`): the image is split along H into
   per-device tiles with a reconstruction margin sized by the transform's
   receptive field; tiles run as a sharded batch (pure data parallelism over
   ICI) and interiors are stitched. Bitstreams become per-tile — the
   standard codec-tiling trade.

2. **Halo-exchange lifting** (:func:`halo_lift97_rows`): a ``shard_map``
   implementation of the 9/7 row-lifting ladder for H-sharded arrays where
   each predict/update step exchanges one boundary row with mesh neighbors
   via ``jax.lax.ppermute`` — the building block for fully-sharded
   single-image transforms (collectives ride ICI, no host gathers).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import Config
from ..ops.math_utils import LIFTING_COEFF

ALPHA, BETA, GAMMA, DELTA, NH, NL = LIFTING_COEFF


class TileMeta(NamedTuple):
    n_tiles: int
    tile_h: int      # interior rows per tile
    overlap: int     # margin rows on each side (multiple of 2^levels)
    height: int
    width: int


def reconstruction_margin(cfg: Config) -> int:
    """Rows of context a tile needs so its interior reconstruction matches
    the untiled transform: per level, the lifting ladder + P/U convs reach
    ~2 + filtersize//2 rows at that level's resolution; compounding over
    levels gives margin ~ 2^levels * (filtersize + 4), rounded up to a
    multiple of 2^levels."""
    unit = 2 ** cfg.dwtlevels
    need = unit * (cfg.filtersize + 4)
    return ((need + unit - 1) // unit) * unit


def tile_image(x: np.ndarray, n_tiles: int, overlap: int
               ) -> Tuple[np.ndarray, TileMeta]:
    """(1, H, W, C) -> (n_tiles, tile_h + 2*overlap, W, C) with edge
    padding at the outer borders. H must divide by n_tiles."""
    _, h, w, c = x.shape
    assert h % n_tiles == 0, f"H={h} must divide into {n_tiles} tiles"
    tile_h = h // n_tiles
    padded = np.pad(x, ((0, 0), (overlap, overlap), (0, 0), (0, 0)),
                    mode="edge")
    tiles = np.stack([
        padded[0, i * tile_h: i * tile_h + tile_h + 2 * overlap]
        for i in range(n_tiles)])
    return tiles, TileMeta(n_tiles, tile_h, overlap, h, w)


def untile_image(tiles: np.ndarray, meta: TileMeta) -> np.ndarray:
    """Discard margins and stitch interiors back to (1, H, W, C)."""
    o = meta.overlap
    parts = [tiles[i, o: o + meta.tile_h] for i in range(meta.n_tiles)]
    return np.concatenate(parts, axis=0)[None]


def make_tiled_eval_step(cfg: Config, model, mesh: Mesh):
    """Eval forward over a tile batch sharded across the mesh."""
    from ..train.state import make_eval_step

    base = make_eval_step(cfg, model)
    tile_sharding = NamedSharding(mesh, P("data"))

    def tiled_step(params, tiles):
        tiles = jax.device_put(tiles, tile_sharding)
        return base(params, tiles)

    return tiled_step


def tiled_forward(cfg: Config, model, params, x: np.ndarray, mesh: Mesh):
    """Full tiled surrogate encode+decode of one high-res image: tile,
    shard over the mesh, forward, stitch. Returns the stitched
    reconstruction in [0, 1]."""
    from ..train.state import apply_color_forward

    n = int(np.prod(mesh.devices.shape))
    overlap = reconstruction_margin(cfg)
    tiles, meta = tile_image(x, n, overlap)
    tile_sharding = NamedSharding(mesh, P("data"))

    @jax.jit
    def fwd(params, tiles):
        _, xhat, _, _, _ = apply_color_forward(
            cfg, model, params, tiles, False, None)
        return jnp.clip(xhat, -0.5, 0.5) + 0.5

    xhat_tiles = np.asarray(fwd(params, jax.device_put(tiles, tile_sharding)))
    return untile_image(xhat_tiles, meta)


def make_halo_eval_step(cfg: Config, model, mesh: Mesh):
    """EXACT fully-sharded surrogate eval (no tiles, no seams).

    The image is H-sharded over the mesh; the transform runs as a
    ``shard_map`` whose boundary rows ride ``ppermute`` over ICI — no
    margins, no re-encode overhead — while the subband AEs and the entropy
    model run on the sharded subbands under GSPMD (pointwise AEs stay
    local; the masked convs of the conditioned entropy models get their
    halos from XLA's SPMD partitioner), and metrics reduce with global
    means. Unlike the per-tile surrogate (:func:`tiled_forward`) this is
    exact and its rates are the true single-stream rates.

    Supported transforms:

    - ``CDF97`` — :func:`halo_dwt97_2d` (ring ppermute == periodization),
      bit-identical to the single-device ladder.
    - ``LiftingBasedNeuralWaveletv4`` (the paper's main transform,
      reference ``wavelet_forward_v2.py:58-81``) —
      :func:`halo_lift2d_forward` / :func:`halo_lift2d_inverse`. The P/U
      convs run in fp32 ``nn.Conv`` form here (identical params) so the
      sharded result matches the unsharded fp32 ladder to float tolerance;
      requires local rows >= the lifting halo radius at the deepest level
      (single-hop neighbor exchange), i.e. H >= n_dev * 2^levels *
      (4*(filtersize//2) + 1) — satisfied by the 2K/4K images this path
      exists for.

    Enabled by ``cfg.halo_eval``; requires image heights divisible by
    ``n_devices * 2 ** dwtlevels``. Returns ``step(params, batch) ->
    RDLossOutput`` — a drop-in for the agent's ``eval_step``.
    """
    from ..ops import color
    from ..train.loss import rd_loss3

    if cfg.netType not in ("CDF97", "LiftingBasedNeuralWaveletv4"):
        raise ValueError("halo_eval supports CDF97 and the learned lifting "
                         f"transform (netType={cfg.netType!r})")
    levels = cfg.dwtlevels
    axis = mesh.axis_names[0]
    n_dev = int(mesh.devices.size)
    unit = n_dev * 2 ** levels

    def _subbands(mdl, ll, highs):
        """AE + entropy on sharded subbands (runs under ``model.apply``)."""
        def one(codec, ll_c, highs_c):
            tr, em = codec.transform, codec.entropymodel
            xe = tr.yl_ae.encode(ll_c)
            xo = [tr.yh_ae[i].encode(highs_c[i]) for i in range(levels)]
            info_xe, info_xo, xe_q, xo_q = em(xe, xo, False)
            ll_hat = tr.yl_ae.decode(xe_q)
            highs_hat = [tr.yh_ae[i].decode(xo_q[i]) for i in range(levels)]
            return info_xe, info_xo, ll_hat, highs_hat
        if mdl.cfg.clrch == 3:
            return one(mdl.codec, ll, highs)
        ixe, ixo, lls, hhs = [], [], [], []
        for i in range(3):
            a, b, c, d = one(mdl.codecs[i], ll[..., i:i + 1],
                             [h[..., 3 * i:3 * (i + 1)] for h in highs])
            ixe.append(a)
            ixo.append(b)
            lls.append(c)
            hhs.append(d)
        info_xe = jnp.concatenate(ixe, axis=-1)
        info_xo = [t for per_plane in ixo for t in per_plane]
        ll_hat = jnp.concatenate(lls, axis=-1)
        highs_hat = [jnp.concatenate([hhs[i][lv] for i in range(3)], axis=-1)
                     for lv in range(levels)]
        return info_xe, info_xo, ll_hat, highs_hat

    if cfg.netType == "CDF97":
        fwd_transform = lambda params, y: halo_dwt97_2d(  # noqa: E731
            y, mesh, levels, axis)
        inv_transform = lambda params, ll, highs: halo_idwt97_2d(  # noqa: E731
            ll, highs, mesh, axis)
    else:
        # Learned lifting: plain fp32 nn.Conv P/U blocks (same param tree as
        # the FastConv5x5 training form) so the sharded ladder is float-
        # equivalent to the unsharded fp32 transform.
        import copy

        from ..models.transforms import make_transform

        cfg32 = copy.copy(cfg)
        cfg32.dtype = "float32"
        transform32 = make_transform(cfg32)

        def _tparams(params):
            if cfg.clrch == 3:
                return [params["codec"]["transform"]]
            return [params[f"codecs_{i}"]["transform"] for i in range(3)]

        def fwd_transform(params, y):
            return halo_lift2d_forward(cfg, transform32, _tparams(params), y,
                                       mesh, axis)

        def inv_transform(params, ll, highs):
            return halo_lift2d_inverse(cfg, transform32, _tparams(params),
                                       ll, highs, mesh, axis)

    @jax.jit
    def _step(params, x):
        if cfg.clrch == 3:
            y = x - 0.5
        else:
            y = color.shift_ycbcr(color.rgb_to_ycbcr(x))
        ll, highs = fwd_transform(params, y)
        info_xe, info_xo, ll_hat, highs_hat = model.apply(
            {"params": params}, ll, highs, method=_subbands)
        yhat = inv_transform(params, ll_hat, highs_hat)
        if cfg.clrch == 3:
            xs, xhat = y, yhat
        else:
            xs = x - 0.5
            xhat = color.ycbcr_to_rgb(color.unshift_ycbcr(yhat)) - 0.5
        xhat = jnp.clip(xhat, -0.5, 0.5)  # reference liftingDWT_agent.py:181
        return rd_loss3(xs, xhat, info_xe, info_xo, cfg.lambda_, 1.0)

    sharding = NamedSharding(mesh, P(None, axis))

    def step(params, batch):
        h = int(batch.shape[1])
        if h % unit:
            raise ValueError(
                f"halo_eval: H={h} must divide by n_devices*2^levels={unit}")
        return _step(params, jax.device_put(jnp.asarray(batch), sharding))

    return step


def halo_dwt97_2d(x, mesh: Mesh, levels: int, axis: str = "data"):
    """Full multi-level 9/7 DWT of an H-sharded NHWC array via shard_map.

    Per level: the row-lifting ladder exchanges single boundary rows with
    ring ``ppermute`` over ICI (periodization == ring wraparound), column
    lifting is device-local, and the recursion continues on the (still
    H-sharded) LL. Matches :func:`..ops.dwt97.dwt97_forward` exactly —
    same ladder, same coefficients — with zero host gathers.

    Local rows must stay even at every level: H must divide by
    ``n_devices * 2^levels``. Returns ``(ll, highs)`` in the standard
    contract, every array H-sharded over the mesh.
    """
    from jax import shard_map

    from ..ops import dwt97

    n_dev = mesh.devices.size
    down = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    up = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def next_first_row(arr):
        return jax.lax.ppermute(arr[:, :1], axis, up)

    def prev_last_row(arr):
        return jax.lax.ppermute(arr[:, -1:], axis, down)

    def lift_rows(xb):
        s = xb[:, 0::2]
        d = xb[:, 1::2]
        d = d + ALPHA * (s + jnp.concatenate(
            [s[:, 1:], next_first_row(s)], axis=1))
        s = s + BETA * (jnp.concatenate(
            [prev_last_row(d), d[:, :-1]], axis=1) + d)
        d = d + GAMMA * (s + jnp.concatenate(
            [s[:, 1:], next_first_row(s)], axis=1))
        s = s + DELTA * (jnp.concatenate(
            [prev_last_row(d), d[:, :-1]], axis=1) + d)
        return s * NL, d * NH

    def body(xb):
        ll = xb
        highs = []
        for _ in range(levels):
            low, high = lift_rows(ll)
            ll, hl = dwt97.lift97_1d(low, axis=2)
            lh, hh = dwt97.lift97_1d(high, axis=2)
            highs.append(dwt97.pack_details(lh, hl, hh))
        return (ll, *highs)

    spec = P(None, axis)
    out = shard_map(body, mesh=mesh, in_specs=(spec,),
                    out_specs=(spec,) * (levels + 1))(x)
    return out[0], list(out[1:])


def halo_idwt97_2d(ll, highs, mesh: Mesh, axis: str = "data"):
    """Exact inverse of :func:`halo_dwt97_2d` (same sharding contract)."""
    from jax import shard_map

    from ..ops import dwt97

    n_dev = mesh.devices.size
    down = [(i, (i + 1) % n_dev) for i in range(n_dev)]
    up = [(i, (i - 1) % n_dev) for i in range(n_dev)]

    def next_first_row(arr):
        return jax.lax.ppermute(arr[:, :1], axis, up)

    def prev_last_row(arr):
        return jax.lax.ppermute(arr[:, -1:], axis, down)

    def ilift_rows(low, high):
        s = low / NL
        d = high / NH
        s = s - DELTA * (jnp.concatenate(
            [prev_last_row(d), d[:, :-1]], axis=1) + d)
        d = d - GAMMA * (s + jnp.concatenate(
            [s[:, 1:], next_first_row(s)], axis=1))
        s = s - BETA * (jnp.concatenate(
            [prev_last_row(d), d[:, :-1]], axis=1) + d)
        d = d - ALPHA * (s + jnp.concatenate(
            [s[:, 1:], next_first_row(s)], axis=1))
        b, hh, w, c = s.shape
        return jnp.stack([s, d], axis=2).reshape(b, hh * 2, w, c)

    def body(ll, *highs):
        for xo in reversed(highs):
            lh, hl, hh = dwt97.unpack_details(xo)
            low = dwt97.ilift97_1d(ll, hl, axis=2)
            high = dwt97.ilift97_1d(lh, hh, axis=2)
            ll = ilift_rows(low, high)
        return ll

    spec = P(None, axis)
    return shard_map(body, mesh=mesh,
                     in_specs=(spec,) * (len(highs) + 1),
                     out_specs=spec)(ll, *highs)


def _ext_axis(t, r: int, ax: int, axis_name: str, n_dev: int):
    """Concatenate ``r`` neighbor rows on each side of the sharded axis
    ``ax`` via non-wrapping ``ppermute``: destinations without a source
    (the global top/bottom devices) receive zeros — exactly the learned
    ladder's zero padding at image boundaries."""
    sl_last = [slice(None)] * t.ndim
    sl_last[ax] = slice(-r, None)
    sl_first = [slice(None)] * t.ndim
    sl_first[ax] = slice(0, r)
    from_prev = jax.lax.ppermute(
        t[tuple(sl_last)], axis_name, [(i, i + 1) for i in range(n_dev - 1)])
    from_next = jax.lax.ppermute(
        t[tuple(sl_first)], axis_name, [(i, i - 1) for i in range(1, n_dev)])
    return jnp.concatenate([from_prev, t, from_next], axis=ax)


def _edge_mask(n_loc: int, r: int, ax: int, axis_name: str, n_dev: int):
    """0/1 mask over an ``r``-extended sharded axis: zero on rows outside
    the global array (only the edge devices see zeros). Multiplied onto
    every conv input so the P/U blocks' SAME zero-padding is reproduced
    exactly at global boundaries (conv biases would otherwise bleed into
    the halo rows — see ``PBlock.__call__``)."""
    idx = jax.lax.axis_index(axis_name)
    g = jnp.arange(n_loc + 2 * r) - r + idx * n_loc
    m = ((g >= 0) & (g < n_dev * n_loc)).astype(jnp.float32)
    shape = [1, 1, 1, 1]
    shape[ax] = n_loc + 2 * r
    return m.reshape(shape)


def _halo_lift_level_fwd(stage, x, axis_name: str, n_dev: int):
    """One sharded 2D learned-lifting level (mirrors
    ``ops/lifting.py::lift_level_forward``, same column-pass batching)."""
    from ..ops.lifting import _split_rows

    r = stage.halo_radius
    R = r + 1
    L, H = _split_rows(x)
    n1 = L.shape[1]
    if n1 < R:
        raise ValueError(
            f"halo lifting needs local rows >= {R} at every level "
            f"(got {n1}); increase H or reduce devices/levels")
    ext1 = lambda t: _ext_axis(t, R, 1, axis_name, n_dev)  # noqa: E731
    m1 = _edge_mask(n1, R, 1, axis_name, n_dev)
    L, H = stage.forward_halo_rows(L, H, ext1, m1, R)
    b = x.shape[0]
    T = jnp.concatenate([jnp.swapaxes(L, 1, 2), jnp.swapaxes(H, 1, 2)],
                        axis=0)
    Ls, Hs = _split_rows(T)          # splits axis 1 == W: device-local
    n2 = Ls.shape[2]
    ext2 = lambda t: _ext_axis(t, r, 2, axis_name, n_dev)  # noqa: E731
    m2 = _edge_mask(n2, r, 2, axis_name, n_dev)
    lo_t, hi_t = stage.forward_halo_cols(Ls, Hs, ext2, m2, r)
    ll = jnp.swapaxes(lo_t[:b], 1, 2)
    hl = jnp.swapaxes(hi_t[:b], 1, 2)
    lh = jnp.swapaxes(lo_t[b:], 1, 2)
    hh = jnp.swapaxes(hi_t[b:], 1, 2)
    return ll, lh, hl, hh


def _halo_lift_level_inv(stage, ll, lh, hl, hh, axis_name: str, n_dev: int):
    """Exact inverse of :func:`_halo_lift_level_fwd`."""
    from ..ops.lifting import _merge_rows

    r = stage.halo_radius
    R = r + 1
    b = ll.shape[0]
    lo_t = jnp.concatenate(
        [jnp.swapaxes(ll, 1, 2), jnp.swapaxes(lh, 1, 2)], axis=0)
    hi_t = jnp.concatenate(
        [jnp.swapaxes(hl, 1, 2), jnp.swapaxes(hh, 1, 2)], axis=0)
    n2 = lo_t.shape[2]
    ext2 = lambda t: _ext_axis(t, r, 2, axis_name, n_dev)  # noqa: E731
    m2 = _edge_mask(n2, r, 2, axis_name, n_dev)
    merged = _merge_rows(*stage.inverse_halo_cols(lo_t, hi_t, ext2, m2, r))
    L = jnp.swapaxes(merged[:b], 1, 2)
    H = jnp.swapaxes(merged[b:], 1, 2)
    n1 = L.shape[1]
    ext1 = lambda t: _ext_axis(t, R, 1, axis_name, n_dev)  # noqa: E731
    m1 = _edge_mask(n1, R, 1, axis_name, n_dev)
    return _merge_rows(*stage.inverse_halo_rows(L, H, ext1, m1, R))


def halo_lift2d_forward(cfg: Config, transform, tparams_list, y,
                        mesh: Mesh, axis: str = "data"):
    """Multi-level learned-lifting analysis of an H-sharded NHWC array.

    ``transform``: an (unbound) ``LearnedLiftingTransform``;
    ``tparams_list``: per-plane transform param trees (1 for joint RGB, 3
    for YCbCr). Per lifting step, boundary slabs of ``halo_radius + 1``
    rows ride ``ppermute`` over ICI; per-conv edge masks reproduce the
    unsharded zero padding exactly (reference transform:
    ``wavelet_forward_v2.py:58-81``). Returns ``(ll, highs)`` channel-
    concatenated over planes, every array H-sharded.
    """
    from jax import shard_map

    from ..ops import dwt97

    levels = cfg.dwtlevels
    n_dev = int(mesh.devices.size)
    nplanes = len(tparams_list)
    cpp = y.shape[-1] // nplanes

    def run(mdl, xb):
        ll = xb
        highs = []
        for lvl in range(levels):
            ll, lh, hl, hh = _halo_lift_level_fwd(
                mdl._stage(lvl), ll, axis, n_dev)
            highs.append(dwt97.pack_details(lh, hl, hh))
        return (ll, *highs)

    def body(xb, *tps):
        lls, packs = [], []
        for i, tp in enumerate(tps):
            out = transform.apply({"params": tp},
                                  xb[..., i * cpp:(i + 1) * cpp], method=run)
            lls.append(out[0])
            packs.append(list(out[1:]))
        ll = jnp.concatenate(lls, axis=-1)
        highs = [jnp.concatenate([packs[i][lv] for i in range(nplanes)],
                                 axis=-1) for lv in range(levels)]
        return (ll, *highs)

    spec = P(None, axis)
    out = shard_map(body, mesh=mesh,
                    in_specs=(spec,) + (P(),) * nplanes,
                    out_specs=(spec,) * (levels + 1))(y, *tparams_list)
    return out[0], list(out[1:])


def halo_lift2d_inverse(cfg: Config, transform, tparams_list, ll, highs,
                        mesh: Mesh, axis: str = "data"):
    """Exact inverse of :func:`halo_lift2d_forward` (same contract)."""
    from jax import shard_map

    from ..ops import dwt97

    levels = cfg.dwtlevels
    n_dev = int(mesh.devices.size)
    nplanes = len(tparams_list)
    cpp = ll.shape[-1] // nplanes

    def run(mdl, ll_p, *highs_p):
        for lvl in range(levels - 1, -1, -1):
            lh, hl, hh = dwt97.unpack_details(highs_p[lvl])
            ll_p = _halo_lift_level_inv(
                mdl._stage(lvl), ll_p, lh, hl, hh, axis, n_dev)
        return ll_p

    def body(ll_b, *rest):
        highs_b = rest[:levels]
        tps = rest[levels:]
        outs = []
        for i, tp in enumerate(tps):
            outs.append(transform.apply(
                {"params": tp}, ll_b[..., i * cpp:(i + 1) * cpp],
                *[h[..., 3 * cpp * i:3 * cpp * (i + 1)] for h in highs_b],
                method=run))
        return jnp.concatenate(outs, axis=-1)

    spec = P(None, axis)
    return shard_map(body, mesh=mesh,
                     in_specs=(spec,) * (levels + 1) + (P(),) * nplanes,
                     out_specs=spec)(ll, *highs, *tparams_list)


def halo_lift97_rows(x, mesh: Mesh, axis: str = "data"):
    """9/7 row-lifting of an H-sharded NHWC array via shard_map + ppermute.

    Each device holds a contiguous row block (local H must be even). Every
    predict/update step needs one neighbor row across the block boundary:
    predict reads the next even row (from the lower neighbor), update reads
    the previous odd row (from the upper neighbor). Those single rows travel
    by ring ``ppermute`` over ICI — and the ring wraparound realizes exactly
    the periodization boundary of :mod:`..ops.dwt97`, so the sharded result
    is bit-comparable to the single-chip ladder.

    Returns (low, high), each sharded with half the local rows.
    """
    from jax import shard_map

    n_dev = mesh.devices.size
    down = [(i, (i + 1) % n_dev) for i in range(n_dev)]   # send to next
    up = [(i, (i - 1) % n_dev) for i in range(n_dev)]     # send to prev

    def next_first_row(arr):
        """First row of the next device's block (periodic ring)."""
        return jax.lax.ppermute(arr[:, :1], axis, up)

    def prev_last_row(arr):
        """Last row of the previous device's block (periodic ring)."""
        return jax.lax.ppermute(arr[:, -1:], axis, down)

    def local_lift(xb):
        s = xb[:, 0::2]
        d = xb[:, 1::2]

        def predict(s, d, coeff):
            s_next = jnp.concatenate([s[:, 1:], next_first_row(s)], axis=1)
            return d + coeff * (s + s_next)

        def update(s, d, coeff):
            d_prev = jnp.concatenate([prev_last_row(d), d[:, :-1]], axis=1)
            return s + coeff * (d_prev + d)

        d = predict(s, d, ALPHA)
        s = update(s, d, BETA)
        d = predict(s, d, GAMMA)
        s = update(s, d, DELTA)
        return s * NL, d * NH

    spec = P(None, axis)
    return shard_map(local_lift, mesh=mesh, in_specs=(spec,),
                     out_specs=(spec, spec))(x)
