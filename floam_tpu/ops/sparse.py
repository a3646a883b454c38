"""Batch-safe sparse primitives: gather/scatter with custom vmap rules.

XLA TPU executes 1-D/2-D-indexed gathers and 1-D scatters at full speed but
falls off a ~100x cliff when the index array gains a leading batch dimension
(docs/PERFORMANCE.md). Under ``jax.vmap`` — the sequence-batched odometry
and multi-chip paths — every table op in the voxel hash map would take that
cliff. These wrappers register custom batching rules that flatten the batch
dimension into per-lane offsets over a flattened table, keeping every
lowered gather/scatter in the fast shape class at any batch size.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap


def _bcast(x, batched, axis_size):
    """Materialize the batch dim for unbatched operands."""
    if batched:
        return x
    return jax.lax.broadcast(x, (axis_size,))


@custom_vmap
def table_gather(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """table (T,) or (T, ch); idx int32 of any rank -> table[idx]."""
    return table[idx]


@table_gather.def_vmap
def _table_gather_vmap(axis_size, in_batched, table, idx):
    table_b, idx_b = in_batched
    table = _bcast(table, table_b, axis_size)
    idx = _bcast(idx, idx_b, axis_size)
    B = axis_size
    T = table.shape[1]
    flat_table = table.reshape((B * T,) + table.shape[2:])
    lane = jnp.arange(B, dtype=idx.dtype).reshape(
        (B,) + (1,) * (idx.ndim - 1))
    shifted = idx + lane * T
    if table.ndim == 2:  # per-lane table is 1-D: fully flatten the index
        flat_idx = shifted.reshape(-1)
    else:  # per-lane (T, ch) row table: keep the last index dim 2-D
        flat_idx = shifted.reshape(-1, shifted.shape[-1])
    out = table_gather(flat_table, flat_idx)
    return out.reshape((B,) + idx.shape[1:] + table.shape[2:]), True


@custom_vmap
def table_scatter_add(table: jnp.ndarray, idx: jnp.ndarray,
                      vals: jnp.ndarray) -> jnp.ndarray:
    """1-D table scatter-add with drop semantics for out-of-range idx."""
    return table.at[idx].add(vals, mode="drop")


@table_scatter_add.def_vmap
def _table_scatter_add_vmap(axis_size, in_batched, table, idx, vals):
    table_b, idx_b, vals_b = in_batched
    table = _bcast(table, table_b, axis_size)
    idx = _bcast(idx, idx_b, axis_size)
    vals = _bcast(vals, vals_b, axis_size)
    B = axis_size
    T = table.shape[1]
    lane = jnp.arange(B, dtype=idx.dtype).reshape(
        (B,) + (1,) * (idx.ndim - 1))
    # preserve drop semantics: out-of-range stays out of range per lane
    oob = (idx < 0) | (idx >= T)
    flat_idx = jnp.where(oob, B * T, idx + lane * T).reshape(-1)
    out = table_scatter_add(table.reshape(-1), flat_idx, vals.reshape(-1))
    return out.reshape(B, T), True


@custom_vmap
def table_scatter_set(table: jnp.ndarray, idx: jnp.ndarray,
                      vals: jnp.ndarray) -> jnp.ndarray:
    """1-D table scatter-set with drop semantics for out-of-range idx."""
    return table.at[idx].set(vals, mode="drop")


@table_scatter_set.def_vmap
def _table_scatter_set_vmap(axis_size, in_batched, table, idx, vals):
    table_b, idx_b, vals_b = in_batched
    table = _bcast(table, table_b, axis_size)
    idx = _bcast(idx, idx_b, axis_size)
    vals = _bcast(vals, vals_b, axis_size)
    B = axis_size
    T = table.shape[1]
    lane = jnp.arange(B, dtype=idx.dtype).reshape(
        (B,) + (1,) * (idx.ndim - 1))
    oob = (idx < 0) | (idx >= T)
    flat_idx = jnp.where(oob, B * T, idx + lane * T).reshape(-1)
    out = table_scatter_set(table.reshape(-1), flat_idx, vals.reshape(-1))
    return out.reshape(B, T), True
