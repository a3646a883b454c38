import sys, time, jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
rng = np.random.default_rng(0)

def timeit_chain(name, fn, x, *args, n=20):
    # x is carried through fn to prevent result caching/overlap tricks
    out = fn(x, *args); jax.block_until_ready(out)
    t0=time.perf_counter()
    for _ in range(n):
        x = fn(x, *args)
    jax.block_until_ready(x)
    print(f"{name:48s} steady {(time.perf_counter()-t0)/n*1e3:8.3f} ms", flush=True)
    return x

H = 131072
Q, O = 16384, 81
tab32 = jnp.asarray(rng.random((H, 32)).astype(np.float32))
idx = jnp.asarray(rng.integers(0, H, (Q, O)).astype(np.int32))

# chained: idx' = g(gathered) so each iteration depends on previous
def g32(idx, tab):
    got = tab[idx]                       # (Q, O, 32)
    s = jnp.sum(got, axis=-1)            # (Q, O)
    return (idx + s.astype(jnp.int32)) & (H - 1)
x = timeit_chain("chained gather rows32 (16k x 81)", jax.jit(g32), idx, tab32)

def gscal(idx, tab):
    got = tab[idx]                       # (Q, O) from (H,)
    return (idx + got.astype(jnp.int32)) & (H - 1)
tab1 = jnp.asarray((rng.random(H)*3).astype(np.float32))
x = timeit_chain("chained gather scalar (16k x 81)", jax.jit(gscal), idx, tab1)

# chained 3D-index gather (the query_knn pattern)
def g3d(idx, tab):
    slots = idx[..., None] * 4 + jnp.arange(4)[None, None, :]  # (Q,O,4)
    got = tab1b[slots]                   # (Q,O,4)
    return (idx + jnp.sum(got, -1).astype(jnp.int32)) & (H - 1)
tab1b = jnp.asarray((rng.random(H*4)*3).astype(np.float32))
x = timeit_chain("chained gather 3D-idx (16k x 81 x 4)", jax.jit(g3d), idx)

# chained elementwise u32 mult
u = jnp.asarray(rng.integers(0, 2**31, (Q, O)).astype(np.uint32))
x = timeit_chain("chained u32 mult (16k,81)", jax.jit(lambda x: x * jnp.uint32(0x85EBCA6B) + jnp.uint32(1)), u)
f = jnp.asarray(rng.random((Q, O)).astype(np.float32))
x = timeit_chain("chained f32 mult (16k,81)", jax.jit(lambda x: x * 1.0000001 + 1e-9), f)

# chained scatter-add
def sc(acc, i, v):
    acc = acc.at[i].add(v)
    return acc
big_i = jnp.asarray(rng.integers(0, H, (147456,)).astype(np.int32))
big_v = jnp.asarray(rng.random(147456).astype(np.float32))
acc0 = jnp.zeros(H, jnp.float32)
x = timeit_chain("chained scatter-add 147k -> (H,)", jax.jit(sc), acc0, big_i, big_v)

# chained dense tile NN
T, Qc, Mc = 256, 64, 512
mt = jnp.asarray(rng.random((T, Mc, 3)).astype(np.float32))
def dense_nn(qt, mt):
    d2 = (jnp.sum(qt*qt, -1)[:, :, None] + jnp.sum(mt*mt, -1)[:, None, :]
          - 2.0 * jnp.einsum("tqc,tmc->tqm", qt, mt))
    m = jnp.min(d2, axis=2)
    return qt + m[..., None] * 1e-9
qt0 = jnp.asarray(rng.random((T, Qc, 3)).astype(np.float32))
x = timeit_chain("chained dense tile NN (min only)", jax.jit(dense_nn), qt0, mt)
