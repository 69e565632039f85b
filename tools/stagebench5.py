"""Density implementation variants (TPU)."""
import os, sys; sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import functools, time
import numpy as np
import jax
import jax.numpy as jnp

N, S = 100, 4096
rng = np.random.default_rng(0)
frames_d = jnp.asarray(rng.integers(700, 1200, (N, S, S), dtype=np.uint16))

def sync(x): return float(jnp.sum(x))
def timeit(label, fn, reps=3):
    fn()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter(); fn(); ts.append(time.perf_counter() - t0)
    print(f"{label}: {min(ts)*1000:.1f} ms", flush=True)

r = 2
sig = 3.0 / 2.35482
d = np.arange(-r, r + 1, dtype=np.float32)
gc = np.exp(-0.5 * d * d / sig ** 2)
gr = np.exp(-0.5 * d * d / (sig * 0.5) ** 2)

def sep_conv(x, col, row, dtype):
    kh, kw = col.shape[0], row.shape[0]
    h, w = x.shape
    colc = jnp.asarray(col, dtype); rowc = jnp.asarray(row, dtype)
    padr = jnp.pad(x, ((kh // 2, kh // 2), (0, 0)))
    t = jnp.zeros_like(x)
    for dy in range(kh):
        t = t + colc[dy] * padr[dy:dy + h, :]
    padc = jnp.pad(t, ((0, 0), (kw // 2, kw // 2)))
    out = jnp.zeros_like(x)
    for dx in range(kw):
        out = out + rowc[dx] * padc[:, dx:dx + w]
    return out

def density(x, dtype):
    n = float((2 * r + 1) ** 2)
    gsum = float(np.sum(gr)) * float(np.sum(gc))
    gsq = float(np.sum(gr * gr)) * float(np.sum(gc * gc))
    denom = gsq - gsum * gsum / n
    xb = x.astype(dtype)
    gconv = sep_conv(xb, gr, gc, dtype)
    ones = np.ones_like(gc)
    box = sep_conv(xb, ones, ones, dtype)
    return ((gconv - jnp.asarray(gsum / n, dtype) * box)
            * jnp.asarray(1.0 / denom, dtype))

C = 4
def make_chunked(dtype, out_bf16):
    @jax.jit
    def run(frames):
        acc = jnp.float32(0)
        for k in range(0, N, C):
            chunk = frames[k:k + C]
            x = chunk.astype(jnp.float32)
            det = 0.5 * (x[:, 0::2, :] + x[:, 1::2, :])
            dd = jax.vmap(lambda a: density(a, dtype))(det)
            if out_bf16:
                dd = dd.astype(jnp.bfloat16)
            acc = acc + jnp.sum(dd[:, ::512, ::512].astype(jnp.float32))
        return acc
    return run

for label, dtype, ob in (("bf16 compute", jnp.bfloat16, False),
                         ("f32 compute, bf16 out", jnp.float32, True),
                         ("f32 compute/out", jnp.float32, False)):
    try:
        fn = make_chunked(dtype, ob)
        timeit(f"density {label}", lambda fn=fn: sync(fn(frames_d)))
    except Exception as e:
        print(f"density {label} failed: {type(e).__name__} {str(e)[:90]}", flush=True)

# XLA native conv path (NCHW, 2x separable as two convs), f32
def conv1d(x, k, axis):
    # x (B, H, W) -> conv along axis with kernel k
    kk = jnp.asarray(k, jnp.float32)
    if axis == 1:
        rhs = kk.reshape(1, 1, -1, 1)
    else:
        rhs = kk.reshape(1, 1, 1, -1)
    return jax.lax.conv_general_dilated(
        x[:, None], rhs, (1, 1), "SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"))[:, 0]

@jax.jit
def run_xla_conv(frames):
    acc = jnp.float32(0)
    n = float((2 * r + 1) ** 2)
    gsum = float(np.sum(gr)) * float(np.sum(gc))
    gsq = float(np.sum(gr * gr)) * float(np.sum(gc * gc))
    denom = gsq - gsum * gsum / n
    ones = np.ones_like(gc)
    for k in range(0, N, C):
        x = frames[k:k + C].astype(jnp.float32)
        det = 0.5 * (x[:, 0::2, :] + x[:, 1::2, :])
        gcv = conv1d(conv1d(det, gr, 1), gc, 2)
        box = conv1d(conv1d(det, ones, 1), ones, 2)
        dd = (gcv - (gsum / n) * box) * (1.0 / denom)
        acc = acc + jnp.sum(dd[:, ::512, ::512])
    return acc

try:
    timeit("density XLA conv f32", lambda: sync(run_xla_conv(frames_d)))
except Exception as e:
    print(f"density XLA conv failed: {type(e).__name__} {str(e)[:90]}", flush=True)
