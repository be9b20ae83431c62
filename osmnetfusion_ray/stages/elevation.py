"""ST3: elevation raster sampling as a stateful actor-pool stage.

The reference fetches elevations from the Open-Elevation API in batches of
2000 with a 1 s sleep (p1_getOtherData.py:27-81) and later joins the JSON
by node index (p2_enrichData.py:372-378). The engine's scale path is a
raster sampler: each actor loads the DEM grid ONCE in ``__init__`` (the
rasterio plug point — not in this container, so the grid is a deterministic
synthetic DEM) and bilinearly samples every batch — no network IO, no
per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

DEFAULT_BBOX = (11.54, 48.12, 11.62, 48.18)


def synthetic_dem(bbox=DEFAULT_BBOX, res: int = 512, seed: int = 42) -> np.ndarray:
    """Deterministic smooth DEM grid (meters) over the bbox: base waves +
    seeded low-frequency noise. Stands in for a real raster tile."""
    rng = np.random.RandomState(seed)
    lon0, lat0, lon1, lat1 = bbox
    xs = np.linspace(lon0, lon1, res)
    ys = np.linspace(lat0, lat1, res)
    gx, gy = np.meshgrid(xs, ys)
    base = 500.0 + 30.0 * np.sin(gx * 40) * np.cos(gy * 40)
    coarse = rng.rand(8, 8) * 20.0
    # bilinear-upsample the coarse noise to the full grid
    ci = np.linspace(0, 7, res)
    i0 = np.clip(ci.astype(int), 0, 6)
    f = ci - i0
    up1 = coarse[i0] * (1 - f)[:, None] + coarse[i0 + 1] * f[:, None]
    noise = up1[:, i0] * (1 - f)[None, :] + up1[:, i0 + 1] * f[None, :]
    return base + noise


class DEMSampler:
    """Actor-pool ``map_batches`` stage: (x, y) → ``elevation`` column by
    bilinear interpolation on the actor-resident grid.

    Use as ``ds.map_batches(DEMSampler, fn_constructor_args=(bbox,),
    concurrency=(1, N), batch_format="pandas")`` — grid built once per
    actor, never per batch.
    """

    def __init__(self, bbox=DEFAULT_BBOX, res: int = 512, seed: int = 42,
                 x_col: str = "x", y_col: str = "y"):
        self.bbox = bbox
        self.grid = synthetic_dem(bbox, res=res, seed=seed)
        self.res = res
        self.x_col, self.y_col = x_col, y_col

    def sample(self, lon: np.ndarray, lat: np.ndarray) -> np.ndarray:
        lon0, lat0, lon1, lat1 = self.bbox
        fx = np.clip((np.asarray(lon) - lon0) / (lon1 - lon0), 0.0, 1.0) * (self.res - 1)
        fy = np.clip((np.asarray(lat) - lat0) / (lat1 - lat0), 0.0, 1.0) * (self.res - 1)
        i0 = np.clip(fx.astype(int), 0, self.res - 2)
        j0 = np.clip(fy.astype(int), 0, self.res - 2)
        tx = fx - i0
        ty = fy - j0
        g = self.grid
        v = (g[j0, i0] * (1 - tx) * (1 - ty) + g[j0, i0 + 1] * tx * (1 - ty)
             + g[j0 + 1, i0] * (1 - tx) * ty + g[j0 + 1, i0 + 1] * tx * ty)
        return np.round(v, 2)

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["elevation"] = self.sample(df[self.x_col].to_numpy(), df[self.y_col].to_numpy())
        return df
