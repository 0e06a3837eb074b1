"""Static rasterizer configuration.

Carries everything that shapes traced programs: tile geometry, capacity
buckets for the sort-based binning, and the RaDe-GS median-depth search
constants (`cuda_rasterizer/config.h:23-39`). Hashable so it can be a static
jit argument.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RasterConfig:
    # Tile geometry. 32x32 = 1024 pixels = one (8,128) f32 vector tile on TPU,
    # vs the reference's 16x16 CUDA blocks (config.h:24-26).
    tile: int = 32
    # Gaussian chunk processed per scan step inside a tile.
    chunk: int = 64
    # Tiles rendered per outer scan step (bounds peak memory of [B,chunk,P]
    # intermediates).
    tile_batch: int = 128

    # Static capacity of the duplicated (gaussian, tile) pair buffer; bump +
    # recompile on overflow (replaces the dynamic `num_rendered` allocation,
    # rasterizer_impl.cu:380-412).
    pair_capacity: int = 1 << 20
    # Static capacity of the POST-SORT aligned pair layout (None = same as
    # pair_capacity). The exact ellipse-tile cull (binning.py) drops ~30% of
    # rect-enumerated pairs before the aligned re-layout, so the aligned
    # buffer — which sizes prepare_pairs, pack, the blend kernels' gradient
    # buffer, and the ~43 ms row-granular pair-grad scatter — can be smaller
    # than the expansion buffer. Overflow is detected via the num_live_pairs
    # metric and bumped like pair_capacity (train/loop.py).
    live_capacity: int | None = None
    # Static cap on gaussians blended per tile (chunk-scan trip count).
    max_per_tile: int = 1 << 12
    # Tile-slice alignment in the pair buffer (lane width of the Pallas
    # kernels; per-tile windows are disjoint multiples of this).
    align: int = 128
    # Blend backend: "ref" = pure-XLA autodiff path, "pallas" = hand-written
    # fwd+bwd TPU kernels, "auto" = pallas on TPU, ref elsewhere.
    backend: str = "auto"

    # Appearance (active degrees are trace-time constants as in the reference's
    # raster settings).
    sh_degree: int = 3
    sg_degree: int = 0

    # Mip-Splatting 2D screen-space dilation (render_forward.cu:191-196).
    kernel_size: float = 0.0
    scale_modifier: float = 1.0

    # RaDe-GS median-depth search (config.h:27-39).
    require_depth: bool = True
    split: int = 8
    split_iterations: int = 5
    sample_range: float = 0.4
    min_transmittance: float = 0.45
    near_plane: float = 0.2

    # Blend-loop thresholds (render_forward.cu:487-500).
    alpha_clamp: float = 0.99
    alpha_min: float = 1.0 / 255.0
    transmittance_min: float = 1e-4

    def grid(self, width: int, height: int) -> tuple[int, int]:
        tx = -(-width // self.tile)
        ty = -(-height // self.tile)
        return tx, ty

    @property
    def pixels_per_tile(self) -> int:
        return self.tile * self.tile
