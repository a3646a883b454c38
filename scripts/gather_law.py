"""Measure the TPU row-gather cost law: time vs number of rows, row width,
table dtype, and batched/flattened shapes. Informs voxelmap layout.

Every timed loop is CHAINED (iteration i+1's inputs depend on i's output)
so neither dispatch pipelining nor the terminal's result caching can
flatter the numbers (see docs/PERFORMANCE.md)."""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir",
                  str(Path(__file__).parent.parent / ".jax_cache"))

import jax.numpy as jnp
import numpy as np


def t_chained(fn, state, *args, n=20):
    """fn(state, *args) -> new state (same shapes). Chained timing."""
    state = jax.block_until_ready(fn(state, *args))
    t0 = time.perf_counter()
    for _ in range(n):
        state = fn(state, *args)
    jax.block_until_ready(state)
    return (time.perf_counter() - t0) / n * 1e3


def main():
    key = jax.random.PRNGKey(0)
    H = 131072

    tables = {W: jax.random.normal(key, (H, W), jnp.float32)
              for W in [4, 8, 16, 32, 64]}

    def make_g(tab):
        @jax.jit
        def g(idx, tab):
            out = tab[idx]  # (Q, O, W)
            # fold output back into the index so the next call differs
            bump = (out[..., 0].astype(jnp.int32) & 1)
            return (idx + bump) % H
        return g

    print(f"{'Q':>6} {'O':>4} {'W':>3} {'rows(k)':>8} {'MB':>7} "
          f"{'ms':>8} {'GB/s':>7} {'ns/row':>7}")
    for Q, O in [(7680, 196), (16384, 54), (7680, 54), (16384, 27),
                 (7680, 27), (16384, 196)]:
        idx0 = jax.random.randint(key, (Q, O), 0, H, jnp.int32)
        for W in [4, 8, 16, 32, 64]:
            g = make_g(tables[W])
            ms = t_chained(g, idx0, tables[W])
            rows = Q * O
            mb = rows * W * 4 / 1e6
            print(f"{Q:>6} {O:>4} {W:>3} {rows/1e3:>8.0f} {mb:>7.1f} "
                  f"{ms:>8.3f} {mb/ms:>7.1f} {ms*1e6/rows:>7.2f}")

    # u32 quantized-coordinate row: gather + 10/10/10 unpack + d2
    tab_u = jax.random.randint(key, (H, 4), 0, 2**31 - 1, jnp.uint32)
    q0 = jax.random.normal(key, (7680, 3), jnp.float32)

    @jax.jit
    def gdec(idx, tab, q):
        rows = tab[idx]  # (Q, O, 4)
        QN, O, W = rows.shape
        v = rows.reshape(QN, O * W)
        x = (v & jnp.uint32(0x3FF)).astype(jnp.float32)
        y = ((v >> 10) & jnp.uint32(0x3FF)).astype(jnp.float32)
        z = ((v >> 20) & jnp.uint32(0x3FF)).astype(jnp.float32)
        dx = x * 0.01 - q[:, 0:1]
        dy = y * 0.01 - q[:, 1:2]
        dz = z * 0.01 - q[:, 2:3]
        d2 = dx * dx + dy * dy + dz * dz
        bump = (d2[:, ::4] > 1.0).astype(jnp.int32)
        return (idx + bump) % H

    idx0 = jax.random.randint(key, (7680, 196), 0, H, jnp.int32)
    ms = t_chained(gdec, idx0, tab_u, q0)
    print(f"u32 gather+unpack101010+d2 (7680,196): {ms:.3f} ms")

    # f32 (H,16) gather + channel-block SoA + d2 (current hot-path shape)
    @jax.jit
    def gsoa(idx, tab, q):
        rows = tab[idx]  # (Q, O, 16)
        QN, O, _ = rows.shape
        cx = rows[:, :, 0:4].reshape(QN, O * 4)
        cy = rows[:, :, 4:8].reshape(QN, O * 4)
        cz = rows[:, :, 8:12].reshape(QN, O * 4)
        dx = cx - q[:, 0:1]
        dy = cy - q[:, 1:2]
        dz = cz - q[:, 2:3]
        d2 = dx * dx + dy * dy + dz * dz
        bump = (d2[:, ::4] > 1.0).astype(jnp.int32)
        return (idx + bump) % H

    ms = t_chained(gsoa, idx0, tables[16], q0)
    print(f"f32 gather+SoA+d2 (7680,196) W16: {ms:.3f} ms")

    idx0s = jax.random.randint(key, (16384, 54), 0, H, jnp.int32)
    qs = jax.random.normal(key, (16384, 3), jnp.float32)
    ms = t_chained(gsoa, idx0s, tables[16], qs)
    print(f"f32 gather+SoA+d2 (16384,54) W16: {ms:.3f} ms")
    ms = t_chained(gdec, idx0s, tab_u, qs)
    print(f"u32 gather+unpack101010+d2 (16384,54): {ms:.3f} ms")

    # batched: flattened custom-vmap layout vs true 3-D vmap gather
    B = 8
    tab_b = jax.random.normal(key, (B * H, 16), jnp.float32)
    idx_b0 = jax.random.randint(key, (B * 16384, 54), 0, B * H, jnp.int32)

    @jax.jit
    def gflat(idx, tab):
        out = tab[idx]
        bump = (out[..., 0].astype(jnp.int32) & 1)
        return (idx + bump) % (B * H)

    ms = t_chained(gflat, idx_b0, tab_b)
    rows = B * 16384 * 54
    print(f"flattened B=8 (131k,54) over (1M,16): {ms:.3f} ms "
          f"({ms*1e6/rows:.2f} ns/row)")

    tab3 = jnp.broadcast_to(tables[16], (B, H, 16))
    idx30 = jax.random.randint(key, (B, 16384, 54), 0, H, jnp.int32)

    @jax.jit
    def gv(idx, tab):
        out = jax.vmap(lambda t_, i_: t_[i_])(tab, idx)
        bump = (out[..., 0].astype(jnp.int32) & 1)
        return (idx + bump) % H

    ms = t_chained(gv, idx30, tab3)
    print(f"vmap 3-D gather B=8 (8,16k,54): {ms:.3f} ms")

    # the full batched SoA pipeline under vmap (slices + reshapes on a
    # (B, Q, O, 16) gather result) vs flattened-by-construction
    qb = jax.random.normal(key, (B, 16384, 3), jnp.float32)

    @jax.jit
    def gsoa_vmap(idx, tab, q):
        def one(t_, i_, q_):
            rows = t_[i_]
            QN, O, _ = rows.shape
            cx = rows[:, :, 0:4].reshape(QN, O * 4)
            cy = rows[:, :, 4:8].reshape(QN, O * 4)
            cz = rows[:, :, 8:12].reshape(QN, O * 4)
            d2 = ((cx - q_[:, 0:1]) ** 2 + (cy - q_[:, 1:2]) ** 2
                  + (cz - q_[:, 2:3]) ** 2)
            return (i_ + (d2[:, ::4] > 1.0).astype(jnp.int32)) % H
        return jax.vmap(one)(tab, idx, q)

    ms = t_chained(gsoa_vmap, idx30, tab3, qb)
    print(f"vmap SoA+d2 pipeline B=8 (8,16k,54): {ms:.3f} ms")

    @jax.jit
    def gsoa_flat(idx, tab, q):
        rows = tab[idx]
        QN, O, _ = rows.shape
        cx = rows[:, :, 0:4].reshape(QN, O * 4)
        cy = rows[:, :, 4:8].reshape(QN, O * 4)
        cz = rows[:, :, 8:12].reshape(QN, O * 4)
        d2 = ((cx - q[:, 0:1]) ** 2 + (cy - q[:, 1:2]) ** 2
              + (cz - q[:, 2:3]) ** 2)
        return (idx + (d2[:, ::4] > 1.0).astype(jnp.int32)) % (B * H)

    qb_flat = qb.reshape(B * 16384, 3)
    ms = t_chained(gsoa_flat, idx_b0, tab_b, qb_flat)
    print(f"flat SoA+d2 pipeline B=8 (131k,54): {ms:.3f} ms")


if __name__ == "__main__":
    main()
