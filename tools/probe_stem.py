"""Standalone stem-conv layout probe (PERF.md "Headroom" follow-up).

The 3x3/s2 RGB stem measures ~2.2 ms of the 10.3 ms batch-128/352²
forward — ~4x off HBM speed-of-light for its traffic (reads 95 MB bf16,
writes 254 MB). Hypothesis: the pathology is the 3-channel input layout,
not the conv itself. This probe times, at batch 128:

  a) conv 3x3/s2 on (352, 352, 3)  — the shipped stem
  b) conv 2x2/s1(pad 1,0) on (176, 176, 12) — SAME math on a host-side
     space-to-depth layout (weights folded via the _stem_w4 convention)
  c) b) chained after an on-device s2d relayout (what the earlier
     experiment measured)
  d) a double-s2d formulation (88, 88, 48) with K=192/N=128 MXU shapes
     (NOTE: the weight fold for d) is buggy — exactness ~5.3 — kept only
     because d) is ALSO slower than b) (the depth-to-space transpose
     costs more than the MXU shapes save), so it was rejected on speed
     before being debugged; see PERF.md "What was tried")

plus each variant's exactness vs a). Usage:
    PYTHONPATH=/root/repo:$PYTHONPATH timeout 580 python tools/probe_stem.py
"""

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    rng = np.random.default_rng(0)
    B, S, C = 128, 352, 32
    x = rng.normal(0, 1, (B, S, S, 3)).astype(np.float32)
    k = rng.normal(0, 0.1, (3, 3, 3, C)).astype(np.float32)

    # host-side space-to-depth: (B, S/2, S/2, 12), channel order (dy,dx,c)
    xs = x.reshape(B, S // 2, 2, S // 2, 2, 3).transpose(0, 1, 3, 2, 4, 5)
    xs = xs.reshape(B, S // 2, S // 2, 12)

    # fold (3,3,3,C) -> (2,2,12,C): output block tap (bi,bj) channel
    # (dy,dx,c) reads original tap (ky,kx) = (2*bi+dy-1, 2*bj+dx-1)
    k4 = np.zeros((2, 2, 12, C), np.float32)
    for bi in range(2):
        for bj in range(2):
            for dy in range(2):
                for dx in range(2):
                    ky, kx = 2 * bi + dy - 1, 2 * bj + dx - 1
                    if 0 <= ky < 3 and 0 <= kx < 3:
                        k4[bi, bj, dy * 6 + dx * 3:dy * 6 + dx * 3 + 3] = \
                            k[ky, kx]

    dn = ("NHWC", "HWIO", "NHWC")

    @jax.jit
    def stem_a(x, k):
        return lax.conv_general_dilated(
            x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), (2, 2),
            [(1, 1), (1, 1)], dimension_numbers=dn)

    @jax.jit
    def stem_b(xs, k4):
        return lax.conv_general_dilated(
            xs.astype(jnp.bfloat16), k4.astype(jnp.bfloat16), (1, 1),
            [(1, 0), (1, 0)], dimension_numbers=dn)

    @jax.jit
    def stem_c(x, k4):
        b, s = x.shape[0], x.shape[1]
        xs = x.reshape(b, s // 2, 2, s // 2, 2, 3).transpose(
            0, 1, 3, 2, 4, 5).reshape(b, s // 2, s // 2, 12)
        return lax.conv_general_dilated(
            xs.astype(jnp.bfloat16), k4.astype(jnp.bfloat16), (1, 1),
            [(1, 0), (1, 0)], dimension_numbers=dn)

    xd, ksd = jnp.asarray(x), jnp.asarray(k)
    xsd, k4d = jnp.asarray(xs), jnp.asarray(k4)

    a = np.asarray(stem_a(xd, ksd), np.float32)
    bb = np.asarray(stem_b(xsd, k4d), np.float32)
    cc = np.asarray(stem_c(xd, k4d), np.float32)
    print("B exact:", np.abs(a - bb).max(), " C exact:",
          np.abs(a - cc).max(), flush=True)

    @jax.jit
    def dep(x, out):
        return x * (1 + 0 * out.reshape(-1)[0].astype(x.dtype))

    def timed(label, fn, x0, w, iters=32):
        def chain(n):
            xx = x0
            t0 = time.perf_counter()
            for _ in range(n):
                out = fn(xx, w)
                xx = dep(x0, out)
            _ = float(jnp.ravel(xx)[0])
            return (time.perf_counter() - t0) / n
        chain(3)
        dt = min(chain(iters), chain(iters))
        print(f"{label:36s} {dt * 1e3:7.3f} ms", flush=True)
        return dt

    # d) DOUBLE s2d: (88, 88, 48) cells of 4x4x3; each 2x2 output-pixel
    # block = one 2x2/s1 conv tap over the cell grid with K=192, N=128
    # (4 output pixels x 32 ch), then depth-to-space back to (176,176,32).
    # Proper MXU shapes for the first time (K,N multiples of the lanes).
    xq = x.reshape(B, S // 4, 4, S // 4, 4, 3).transpose(0, 1, 3, 2, 4, 5)
    xq = np.ascontiguousarray(xq.reshape(B, S // 4, S // 4, 48))
    # fold (3,3,3,C) -> (2,2,192,4C): output pixel (u,v) of block (i,j),
    # tap (bi,bj) channel (dy,dx,c): original tap (ky,kx) =
    # (4*bi + dy - (2u+1), 4*bj + dx - (2v+1)) per conv-pad-1 at stride 2
    kq = np.zeros((2, 2, 48, 4 * C), np.float32)
    for u in range(2):
        for v in range(2):
            for bi in range(2):
                for bj in range(2):
                    for dy in range(4):
                        for dx in range(4):
                            ky = 4 * bi + dy - (2 * u + 1)
                            kx = 4 * bj + dx - (2 * v + 1)
                            if 0 <= ky < 3 and 0 <= kx < 3:
                                ci = dy * 12 + dx * 3
                                kq[bi, bj, ci:ci + 3,
                                   (u * 2 + v) * C:(u * 2 + v + 1) * C] = \
                                    k[ky, kx]

    @jax.jit
    def stem_d(xq, kq):
        b, s4 = xq.shape[0], xq.shape[1]
        y = lax.conv_general_dilated(
            xq.astype(jnp.bfloat16), kq.astype(jnp.bfloat16), (1, 1),
            [(1, 0), (1, 0)], dimension_numbers=dn)   # (B, 88, 88, 128)
        y = y.reshape(b, s4, s4, 2, 2, C).transpose(0, 1, 3, 2, 4, 5)
        return y.reshape(b, s4 * 2, s4 * 2, C)

    xqd, kqd = jnp.asarray(xq), jnp.asarray(kq)
    dd = np.asarray(stem_d(xqd, kqd), np.float32)
    print("D exact:", np.abs(a - dd).max(), flush=True)

    timed("a) 3x3/s2 on (352,352,3)", stem_a, xd, ksd)
    timed("b) 2x2/s1 on host-s2d (176,176,12)", stem_b, xsd, k4d)
    timed("c) device s2d + 2x2/s1", stem_c, xd, k4d)
    timed("d) 2x2/s1 on host-s2dx4 (88,88,48) + d2s", stem_d, xqd, kqd)

    # bf16-resident input variants (serving keeps activations bf16)
    timed("a) bf16-resident input", stem_a, xd.astype(jnp.bfloat16), ksd)
    timed("b) bf16-resident s2d input", stem_b,
          xsd.astype(jnp.bfloat16), k4d)
    timed("d) bf16-resident s2dx4 input", stem_d,
          xqd.astype(jnp.bfloat16), kqd)


if __name__ == "__main__":
    main()
