"""Friction-coefficient terrain maps (the slippery-patch worlds).

In the reference, "obstacles" are thin boxes/cylinders whose ONLY functional
property is reduced contact friction (mu in the <surface><friction> block:
easy 0.8, medium 0.5, hard 0.15-0.3 — reference dogbot_gazebo/models/
{box,circle,...}_{easy,medium,hard}/model.sdf), laid out by the case1-4
worlds (dogbot_gazebo/worlds/case*.world).  Here a terrain IS a mu grid:
scenario generation rasterizes patch primitives into a (res x res) array,
and the contact model samples mu at each foot — fully batched, so thousands
of random worlds run per chip.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..config import SimConfig


class Terrain(NamedTuple):
    """mu_map: (.., res, res) friction grid over
    [-extent, extent]^2; ground height is 0 everywhere (FlatGround, the
    terrain the reference actually uses — topt.cpp:9)."""

    mu_map: jnp.ndarray
    extent: float
    res: int


def flat(cfg: SimConfig, mu: float | None = None, batch=(),
         dtype=jnp.float32) -> Terrain:
    m = cfg.mu_default if mu is None else mu
    return Terrain(
        mu_map=jnp.full(batch + (cfg.terrain_res, cfg.terrain_res), m, dtype),
        extent=cfg.terrain_extent, res=cfg.terrain_res)


def sample_mu(t: Terrain, xy: jnp.ndarray) -> jnp.ndarray:
    """mu at world xy ((.., 2)) by nearest-cell lookup (patch mu is
    piecewise constant in the reference worlds too)."""
    scale = t.res / (2.0 * t.extent)
    ij = jnp.clip(((xy + t.extent) * scale), 0, t.res - 1).astype(jnp.int32)
    return t.mu_map[..., ij[..., 1], ij[..., 0]]


def _grid(cfg: SimConfig):
    xs = (np.arange(cfg.terrain_res) + 0.5) / cfg.terrain_res
    xs = xs * 2 * cfg.terrain_extent - cfg.terrain_extent
    return np.meshgrid(xs, xs)             # X (res,res), Y (res,res)


def add_circle(cfg: SimConfig, mu_map: np.ndarray, cx, cy, r, mu) -> np.ndarray:
    X, Y = _grid(cfg)
    mask = (X - cx) ** 2 + (Y - cy) ** 2 <= r * r
    out = mu_map.copy()
    out[..., mask] = mu
    return out


def add_box(cfg: SimConfig, mu_map: np.ndarray, cx, cy, lx, ly, mu) -> np.ndarray:
    X, Y = _grid(cfg)
    mask = (np.abs(X - cx) <= lx / 2) & (np.abs(Y - cy) <= ly / 2)
    out = mu_map.copy()
    out[..., mask] = mu
    return out


# --- the reference case-study worlds as terrain builders ----------------
# Patch mu values from the model.sdf files: circle_big_hard 0.2,
# circle_hard 0.3, box_hard 0.15, *_medium 0.5, *_easy 0.8.

def case_world(cfg: SimConfig, case: int, dtype=jnp.float32) -> Terrain:
    """Friction layouts mirroring dogbot_gazebo/worlds/case{1..4}.world:
    case1 = corridor of big slippery circles, case2 = boxes + circles,
    case3 = one medium square, case4 = one hard box.  (Coordinates follow
    the world files' spirit: patches straddle the straight-line path from
    the spawn to a forward goal along +y.)"""
    m = np.full((cfg.terrain_res, cfg.terrain_res), cfg.mu_default)
    if case == 1:
        for i, (cx, cy) in enumerate([(-0.4, 1.0), (0.45, 1.8), (-0.3, 2.6),
                                      (0.5, 3.4), (0.0, 4.2)]):
            m = add_circle(cfg, m, cx, cy, 0.45, 0.2)
    elif case == 2:
        for cx, cy in [(-0.4, 1.0), (0.4, 1.6), (0.0, 2.3), (-0.45, 3.0),
                       (0.4, 3.6)]:
            m = add_box(cfg, m, cx, cy, 0.6, 0.5, 0.15)
        for cx, cy in [(0.0, 1.0), (0.0, 4.3)]:
            m = add_circle(cfg, m, cx, cy, 0.3, 0.3)
    elif case == 3:
        m = add_box(cfg, m, 0.0, 1.5, 0.8, 0.8, 0.5)
    elif case == 4:
        m = add_box(cfg, m, 0.0, 1.5, 0.9, 0.7, 0.15)
    return Terrain(mu_map=jnp.asarray(m, dtype), extent=cfg.terrain_extent,
                   res=cfg.terrain_res)


def random_patches(cfg: SimConfig, rng: np.random.Generator, n_patches=5,
                   mu_range=(0.15, 0.5), area=3.5, batch=1,
                   dtype=jnp.float32) -> Terrain:
    """Batched random slippery-patch worlds for scenario sweeps."""
    maps = np.empty((batch, cfg.terrain_res, cfg.terrain_res))
    for b in range(batch):
        m = np.full((cfg.terrain_res, cfg.terrain_res), cfg.mu_default)
        for _ in range(n_patches):
            cx, cy = rng.uniform(-area / 2, area / 2), rng.uniform(0.6, area)
            mu = rng.uniform(*mu_range)
            if rng.uniform() < 0.5:
                m = add_circle(cfg, m, cx, cy, rng.uniform(0.2, 0.5), mu)
            else:
                m = add_box(cfg, m, cx, cy, rng.uniform(0.3, 0.8),
                            rng.uniform(0.3, 0.8), mu)
        maps[b] = m
    return Terrain(mu_map=jnp.asarray(maps, dtype), extent=cfg.terrain_extent,
                   res=cfg.terrain_res)
