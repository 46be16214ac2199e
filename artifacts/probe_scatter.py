"""Microbenchmark: XLA TPU scatter-add vs gather vs row reduction at
the 131k-atom EAM scale (11M pairs) — the measurement behind the
round-4 scatter-free EFS design (fast_efs.py / make_dense_efs_fn).

Shapes model the real workload: N = 131,072 atoms, NNL = 128 dense
width (8.4M slots), flat npairs = 11.3M. Each op is timed marginally
(K-vs-1 fused scan, host fetch forced — block_until_ready does not
block on the axon backend).

Run on the chip: PYTHONPATH=/root/repo python artifacts/probe_scatter.py
Prints one JSON line with ms per op and effective GB/s.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    N, NNL = 131072, 128
    NPAIR = 11_300_000
    rng = np.random.RandomState(0)
    seg_ids = jnp.asarray(np.sort(rng.randint(0, N, NPAIR)), jnp.int32)
    jd = jnp.asarray(rng.randint(0, N, (N, NNL)), jnp.int32)
    x_flat = jnp.asarray(rng.normal(size=(NPAIR,)), jnp.float32)
    x_dense = jnp.asarray(rng.normal(size=(N, NNL, 3)), jnp.float32)
    pos = jnp.asarray(rng.normal(size=(N, 3)), jnp.float32)

    def marginal(make_body, *args, k_hi=5):
        def mk(k):
            def f(*a):
                def body(c, _):
                    return c + make_body(c, *a), None
                c, _ = jax.lax.scan(body, jnp.zeros(()), None, length=k)
                return c
            return jax.jit(f)
        g1, gk = mk(1), mk(k_hi)
        float(g1(*args)), float(gk(*args))
        def best(g):
            b = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                float(g(*args))
                b = min(b, time.perf_counter() - t0)
            return b
        return max((best(gk) - best(g1)) / (k_hi - 1), 1e-9)

    out = {}

    def probe(name, fn):
        # one row OOMing HBM must not cost the whole probe (the r4
        # first pass died whole inside one sort-based scatter
        # lowering: probe_scatter_r4_oom.err)
        try:
            fn()
        except Exception as exc:  # noqa: BLE001
            out[name + "_error"] = f"{type(exc).__name__}: {exc}"[:300]

    # 1. segment_sum scatter, sorted ids (EAM forward rho sum)
    def p_seg():
        t = marginal(lambda c, x, i: jnp.sum(jax.ops.segment_sum(
            x + c * 1e-12, i, num_segments=N)), x_flat, seg_ids)
        out["segment_sum_11M_ms"] = round(t * 1e3, 2)
        out["segment_sum_gbps"] = round(x_flat.nbytes / t / 1e9, 1)
    probe("segment_sum", p_seg)

    # 2. scatter-add via .at[].add (gather-VJP shape: [N*NNL] -> [N]).
    # Measured PER COMPONENT ([M] f32 -> [N]): the honest [M, 3]
    # operand OOMs the chip outright — XLA lays the scatter operand
    # out in (8, 128) tiles, padding the minor dim 3 -> 128 (42.7x,
    # 2 x 8 GB temps at this M; see probe_scatter_r4_oom.err). That
    # padding tax is itself part of why autodiff-gather VJPs are
    # catastrophic on TPU. The 16.7M-id scatter's own sort-based
    # lowering also allocates multi-GB temps, so it is scanned in 4
    # chunks of 4.2M ids (same bytes, bounded temps).
    flat_ids = jd.reshape(4, -1)
    xf = x_dense[..., 0].reshape(4, -1)

    def p_scat():
        def body(c, xi):
            x, i = xi
            return c + jnp.sum(
                jnp.zeros((N,), x.dtype).at[i].add(x + c * 1e-12)), None
        t = marginal(lambda c, x, i: jax.lax.scan(
            body, c * 1e-12, (x, i))[0], xf, flat_ids)
        out["scatter_add_16M_1comp_ms"] = round(t * 1e3, 2)
        out["scatter_add_gbps"] = round(xf.nbytes / t / 1e9, 1)
    probe("scatter_add", p_scat)

    # 3. gather [N,3] at [N,NNL] (fast-path position fetch)
    def p_gather():
        t = marginal(lambda c, p, i: jnp.sum(p[i] * (1 + c * 1e-12)),
                     pos, jd)
        out["gather_8M_ms"] = round(t * 1e3, 2)
        out["gather_gbps"] = round(x_dense.nbytes / t / 1e9, 1)
    probe("gather", p_gather)

    # 4. dense row reduction [N, NNL, 3] -> [N, 3]
    def p_reduce():
        t = marginal(
            lambda c, x: jnp.sum(jnp.sum(x + c * 1e-12, axis=1)),
            x_dense)
        out["row_reduce_8M_ms"] = round(t * 1e3, 2)
        out["row_reduce_gbps"] = round(x_dense.nbytes / t / 1e9, 1)
    probe("row_reduce", p_reduce)

    # 5. row-sorted compaction (device-NL build pattern): one int32
    # sort along dim 1 at candidate width C = 864
    C = 864
    key = jnp.asarray(rng.randint(0, C + 1, (N, C)), jnp.int32)

    def p_sort():
        t = marginal(lambda c, k: jnp.sum(
            jax.lax.sort(k + (c * 1e-12).astype(jnp.int32),
                         dimension=1)[:, :NNL].astype(jnp.float32)),
            key)
        out["row_sort_864w_ms"] = round(t * 1e3, 2)
    probe("row_sort", p_sort)

    # 5b. partial selection of the NNL smallest keys (the
    # TA_NL_COMPACTION=topk device-NL variant)
    def p_topk():
        t = marginal(lambda c, k: jnp.sum(
            jax.lax.top_k(-(k + (c * 1e-12).astype(jnp.int32)),
                          NNL)[0].astype(jnp.float32)), key)
        out["row_topk_864w_ms"] = round(t * 1e3, 2)
    probe("row_topk", p_topk)

    out["backend"] = jax.default_backend()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
