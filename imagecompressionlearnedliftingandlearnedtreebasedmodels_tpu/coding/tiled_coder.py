"""Tiled bitstream coding for high-resolution images.

The reference is resolution-agnostic only up to single-GPU memory; this is
the bitstream-path counterpart of :mod:`..parallel.tiling`'s surrogate
tiling (SURVEY.md section 5, BASELINE config 4): a 2K/4K image is split
along H into tiles with a reconstruction margin, every tile is encoded as an
independent bitstream (all entropy models supported, including the wavefront
AR path), and decode stitches tile interiors.

Design trade (vs a fully-sharded single-stream transform): per-tile streams
keep decode embarrassingly parallel across the mesh/host pool and bound the
AR wavefront's sequential span to one tile's height; the cost is the margin
re-encode (margin/tile_h rate overhead, a few percent at 2K+) plus the loss
of cross-tile context. The fully-sharded transform exists for the surrogate
path (:func:`..parallel.tiling.halo_dwt97_2d` — exact, collectives over
ICI); its bitstream variant would serialize the AR wavefront across devices,
which is the wrong trade on a tunneled host<->device link.

Tiles are independent; they are coded through a thread pool, which overlaps
host<->device RTTs exactly like the per-plane threading in
:meth:`..coding.codec_coder.CodecCoder.compress_decompress`.
"""

from __future__ import annotations

import dataclasses
from concurrent.futures import ThreadPoolExecutor
from typing import List, Tuple

import numpy as np

from ..config import Config
from ..parallel.tiling import TileMeta, reconstruction_margin, tile_image
from .codec_coder import CodecCoder, CodecResult, PlaneStreams


@dataclasses.dataclass
class TiledStreams:
    """Container for one tiled image: per-tile, per-plane byte streams."""
    meta: TileMeta
    tiles: List[List[PlaneStreams]]
    xe_shape: Tuple[int, ...]
    xo_shapes: List[Tuple[int, ...]]

    def nbytes(self) -> int:
        return sum(p.nbytes() for t in self.tiles for p in t)


class TiledCodecCoder:
    """Per-tile bitstream compress/decompress around one CodecCoder."""

    def __init__(self, cfg: Config, model, params, n_tiles: int,
                 parallel: bool = True):
        self.cfg = cfg
        self.coder = CodecCoder(cfg, model, params)
        self.n_tiles = n_tiles
        self.parallel = parallel

    # -- color policy (mirrors CodecCoder.compress_decompress) ----------
    def _to_planes(self, x: np.ndarray) -> List[np.ndarray]:
        from ..ops import color
        import jax.numpy as jnp

        if self.cfg.clrch == 3:
            return [x - 0.5]
        ycbcr = np.asarray(color.shift_ycbcr(
            color.rgb_to_ycbcr(jnp.asarray(x))))
        return [ycbcr[..., i:i + 1] for i in range(3)]

    def _from_planes(self, yhats: List[np.ndarray]) -> np.ndarray:
        from ..ops import color
        import jax.numpy as jnp

        if self.cfg.clrch == 3:
            return np.clip(yhats[0], -0.5, 0.5) + 0.5
        y = np.concatenate(yhats, axis=-1)
        xhat = np.asarray(color.ycbcr_to_rgb(
            color.unshift_ycbcr(jnp.asarray(y))))
        return np.clip(xhat, 0.0, 1.0)

    # -- tile drivers -----------------------------------------------------
    def _code_tile(self, tile: np.ndarray):
        planes = self._to_planes(tile[None])
        streams, yhats = [], []
        shapes = None
        for p, y in enumerate(planes):
            ps, _, xe_hat, xo_hats = self.coder.compress_plane(p, y)
            streams.append(ps)
            shapes = (xe_hat.shape, [t.shape for t in xo_hats])
            yhat = self.coder.decompress_plane(
                p, ps, xe_hat.shape, [t.shape for t in xo_hats])
            yhats.append(yhat)
        return streams, self._from_planes(yhats)[0], shapes

    def _decode_tile(self, streams: List[PlaneStreams], xe_shape, xo_shapes):
        yhats = [self.coder.decompress_plane(p, ps, xe_shape, xo_shapes)
                 for p, ps in enumerate(streams)]
        return self._from_planes(yhats)[0]

    def _map_tiles(self, fn, items):
        if self.parallel and len(items) > 1:
            with ThreadPoolExecutor(max_workers=min(8, len(items))) as pool:
                return list(pool.map(fn, items))
        return [fn(it) for it in items]

    # -- public API ---------------------------------------------------------
    def compress(self, x: np.ndarray) -> Tuple[TiledStreams, np.ndarray]:
        """(1, H, W, 3) RGB in [0,1] -> (streams, encoder-side stitched
        reconstruction). H must divide into ``n_tiles``."""
        overlap = reconstruction_margin(self.cfg)
        tiles, meta = tile_image(np.asarray(x, np.float32), self.n_tiles,
                                 overlap)
        results = self._map_tiles(self._code_tile, list(tiles))
        streams = [r[0] for r in results]
        xe_shape, xo_shapes = results[0][2]
        xhat = self._stitch([r[1] for r in results], meta)
        return (TiledStreams(meta, streams, xe_shape, xo_shapes), xhat)

    def decompress(self, ts: TiledStreams) -> np.ndarray:
        tiles = self._map_tiles(
            lambda s: self._decode_tile(s, ts.xe_shape, ts.xo_shapes),
            ts.tiles)
        return self._stitch(tiles, ts.meta)

    @staticmethod
    def _stitch(tiles: List[np.ndarray], meta: TileMeta) -> np.ndarray:
        o = meta.overlap
        parts = [t[o: o + meta.tile_h] for t in tiles]
        return np.concatenate(parts, axis=0)[None]

    def compress_decompress(self, x: np.ndarray) -> CodecResult:
        ts, _ = self.compress(x)
        xhat = self.decompress(ts)
        h, w = ts.meta.height, ts.meta.width
        bpp = ts.nbytes() * 8.0 / (h * w)
        mse = float(np.mean((x - xhat) ** 2))
        psnr = float(-10.0 * np.log10(max(mse, 1e-12)))
        return CodecResult(xhat, bpp, psnr, [s for t in ts.tiles for s in t])
