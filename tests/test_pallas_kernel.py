"""Pallas SpMM kernel tests (interpret mode on CPU; the same code paths
run compiled on TPU — validated on hardware, see bench.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from graphgym_tpu.ops.pallas import spmm_kernel as K


def coo_oracle(s, r, w, x, n):
    out = np.zeros((n, x.shape[1]), np.float32)
    np.add.at(out, r, x[s] * w[:, None])
    return out


def rand_coo(n, e, d, seed=0):
    rng = np.random.default_rng(seed)
    s = rng.integers(0, n, size=e).astype(np.int32)
    r = rng.integers(0, n, size=e).astype(np.int32)
    w = rng.random(e).astype(np.float32)
    x = rng.normal(size=(n, d)).astype(np.float32)
    return s, r, w, x


class TestPack:
    def test_pack_covers_all_edges(self):
        s, r, w, x = rand_coo(1000, 5000, 8)
        pack = K.pack_csr(s, r, w, 1000)
        # every real edge appears exactly once (match by weight sum)
        np.testing.assert_allclose(float(np.asarray(pack.weights).sum()),
                                   float(w.sum()), rtol=1e-5)
        # local rows within tile bounds
        assert int(np.asarray(pack.local_rows).max()) < K.ROWS_PER_TILE
        # tiles ascending
        t = np.asarray(pack.tiles)
        assert np.all(np.diff(t) >= 0)

    def test_pack_pad_chunks(self):
        s, r, w, x = rand_coo(100, 500, 8)
        pack = K.pack_csr(s, r, w, 100, pad_chunks_to=16)
        assert pack.senders.shape[0] == 16

    def test_empty_tile_gets_padding_chunk(self):
        # all edges into rows [0, 10): tiles beyond 0 are empty but must
        # still emit a chunk so every output tile is written
        s = np.zeros(50, np.int32)
        r = np.arange(50, dtype=np.int32) % 10
        pack = K.pack_csr(s, r, None, 1000)
        num_tiles = (1000 + K.ROWS_PER_TILE - 1) // K.ROWS_PER_TILE
        assert set(np.asarray(pack.tiles).tolist()) == set(
            range(num_tiles))


class TestKernelInterpret:
    @pytest.mark.parametrize("n,e", [(1000, 5000), (257, 4096),
                                     (64, 100)])
    def test_matches_oracle(self, n, e):
        s, r, w, x = rand_coo(n, e, 128)
        ref = coo_oracle(s, r, w, x, n)
        out = K.spmm_pallas(s, r, w, jnp.asarray(x), n, interpret=True)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3,
                                   atol=1e-3)

    def test_hot_row(self):
        s, r, w, x = rand_coo(1000, 5000, 128)
        r[:] = 7
        ref = coo_oracle(s, r, w, x, 1000)
        out = K.spmm_pallas(s, r, w, jnp.asarray(x), 1000,
                            interpret=True)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-3,
                                   atol=2e-2)

    def test_bf16_fast_path(self):
        # bf16 inputs take the one-pass MXU path: bf16-level accuracy,
        # bf16 output dtype (mixed-precision training mode)
        n, e = 300, 2000
        s, r, w, x = rand_coo(n, e, 32)
        ref = coo_oracle(s, r, w, x, n)
        pack = K.pack_csr(s, r, w, n)
        out = K.spmm_packed(pack, jnp.asarray(x, jnp.bfloat16), n,
                            interpret=True)
        assert out.dtype == jnp.bfloat16
        scale = np.abs(ref).max()
        err = np.abs(np.asarray(out, np.float32) - ref).max()
        assert err / scale < 2e-2, err / scale

    def test_bidir_grad_matches_dense(self):
        n, e, d = 200, 1000, 128
        s, r, w, x = rand_coo(n, e, d)
        pack = K.pack_bidir(s, r, w, n)

        def loss(x_):
            return jnp.sum(K.spmm_bidir(pack, x_, n) ** 2)

        # interpret path for CPU: swap kernels via monkeypatch-free
        # route — spmm_packed(interpret=True) on fwd and bwd manually
        fwd = K.spmm_packed(pack.fwd, jnp.asarray(x), n, interpret=True)
        g = 2 * np.asarray(fwd)
        dx = K.spmm_packed(pack.bwd, jnp.asarray(g), n, interpret=True)
        A = np.zeros((n, n), np.float32)
        np.add.at(A, (r, s), w)
        dref = 2 * A.T @ (A @ x)
        np.testing.assert_allclose(np.asarray(dx), dref, rtol=1e-3,
                                   atol=1e-3)

    def test_sddmm_edge_grad(self):
        n, e, d = 100, 400, 16
        s, r, w, x = rand_coo(n, e, d)
        g = np.random.default_rng(1).normal(size=(n, d)).astype(
            np.float32)
        pack = K.pack_bidir(s, r, w, n)
        dw = K.sddmm_edge_grad(pack, jnp.asarray(x), jnp.asarray(g))
        ref = np.sum(g[r] * x[s], axis=-1)
        np.testing.assert_allclose(np.asarray(dw), ref, rtol=1e-4,
                                   atol=1e-4)


class TestHeadedKernel:
    """Per-head weighted aggregation (attention value path):
    segment_matmul_headed_vjp vs the dense reference, values and both
    gradients."""

    def _setup(self, n=150, e=700, heads=4, dv=8, seed=5):
        rng = np.random.default_rng(seed)
        s = rng.integers(0, n, e).astype(np.int32)
        r = rng.integers(0, n, e).astype(np.int32)
        pack = K.pack_csr(s, r, None, n)
        nc, c = pack.senders.shape
        v = rng.normal(size=(n + 1, heads, dv)).astype(np.float32)
        v[n] = 0.0
        alpha = rng.random((nc, c, heads)).astype(np.float32)
        alpha *= np.asarray(pack.weights)[..., None]  # zero on padding
        vj = v[np.asarray(pack.senders)].reshape(nc, c, heads * dv)
        return s, r, pack, v, alpha, vj, heads, dv, n

    def test_forward_matches_dense(self):
        s, r, pack, v, alpha, vj, H, dv, n = self._setup()
        out = K.segment_matmul_headed_vjp(
            jnp.asarray(vj), jnp.asarray(alpha), pack.local_rows,
            pack.tiles, n, H)
        rows = np.asarray(K.pack_rows(pack))
        ref = np.zeros((n, H, dv), np.float32)
        nc, c = rows.shape
        for i in range(nc):
            for j in range(c):
                if np.asarray(pack.weights)[i, j] > 0:
                    ref[rows[i, j]] += (alpha[i, j][:, None]
                                        * vj[i, j].reshape(H, dv))
        np.testing.assert_allclose(np.asarray(out).reshape(n, H, dv),
                                   ref, rtol=1e-3, atol=1e-3)

    def test_gradients(self):
        s, r, pack, v, alpha, vj, H, dv, n = self._setup(n=60, e=200)

        def loss(vj_, alpha_):
            out = K.segment_matmul_headed_vjp(
                vj_, alpha_, pack.local_rows, pack.tiles, n, H)
            return jnp.sum(out ** 2)

        g_vj, g_a = jax.grad(loss, argnums=(0, 1))(
            jnp.asarray(vj), jnp.asarray(alpha))
        # reference grads via explicit dense formulation
        rows = np.asarray(K.pack_rows(pack))
        out = np.zeros((n, H, dv), np.float32)
        nc, c = rows.shape
        w = np.asarray(pack.weights)
        for i in range(nc):
            for j in range(c):
                if w[i, j] > 0:
                    out[rows[i, j]] += (alpha[i, j][:, None]
                                        * vj[i, j].reshape(H, dv))
        g_out = 2 * out
        ref_vj = np.zeros_like(vj)
        ref_a = np.zeros_like(alpha)
        for i in range(nc):
            for j in range(c):
                go = g_out[min(rows[i, j], n - 1)]
                ref_vj[i, j] = (go * alpha[i, j][:, None]).reshape(-1)
                ref_a[i, j] = np.sum(
                    go * vj[i, j].reshape(H, dv), axis=-1)
        np.testing.assert_allclose(np.asarray(g_vj), ref_vj,
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(g_a), ref_a,
                                   rtol=1e-3, atol=1e-3)


class TestEgoUnionShapes:
    """Shape-regression guard for the round-4 ID-GAT/ba OOM (VERDICT r4
    task 3): the per-slot scalar streams ([NC, C] local rows / weights)
    must stay 2-D lane-major all the way into pallas_call — a
    [NC, C, 1] layout's HBM tiling pads the unit minor dim to 128
    lanes, which at the ba ego-union scale (NC ~ 4k chunks) is ~2 GiB
    of pure padding and OOMs the chip.  Interpret mode can't measure
    HBM, so this asserts the layout contract (operand ranks/shapes)
    and exercises the kernel at a scaled-down ego-union-like profile
    (many chunks, H=1) through values and both gradients."""

    def test_headed_kernel_scalar_operands_stay_2d(self):
        import jax
        import jax.numpy as jnp

        n, e, h, dv = 2048, 30000, 1, 64
        rng = np.random.default_rng(3)
        s = rng.integers(0, n, e).astype(np.int32)
        r = rng.integers(0, n, e).astype(np.int32)
        pack = K.pack_csr(s, r, None, n)
        nc, c = pack.senders.shape
        msg = rng.normal(size=(nc, c, h * dv)).astype(np.float32)
        alpha = (rng.random((nc, c, h)).astype(np.float32)
                 * (np.asarray(pack.weights) > 0)[..., None])

        # layout contract: the jaxpr feeding pallas_call must carry the
        # scalar streams as rank-2 (lane-major) operands — a rank-3
        # [NC, C, 1]/[NC, C, H] operand is the OOM regression
        jaxpr = jax.make_jaxpr(
            lambda m, a: K.segment_matmul_headed_vjp(
                m, a, pack.local_rows, pack.tiles, n, h))(
            jnp.asarray(msg), jnp.asarray(alpha))
        found = []

        def walk(jx):
            for eq in jx.eqns:
                if eq.primitive.name == "pallas_call":
                    found.append(eq)
                for sub in eq.params.values():
                    if hasattr(sub, "jaxpr"):
                        walk(sub.jaxpr)
                    if isinstance(sub, (list, tuple)):
                        for s2 in sub:
                            if hasattr(s2, "jaxpr"):
                                walk(s2.jaxpr)

        walk(jaxpr.jaxpr)
        assert found, "no pallas_call found in jaxpr"
        for eq in found:
            for var in eq.invars:
                shape = getattr(var.aval, "shape", ())
                if len(shape) == 3:
                    # only the [NC, C, D] message stream may be rank-3
                    assert shape[2] >= 64, (
                        f"rank-3 pallas operand with unit-ish minor dim "
                        f"{shape} — HBM tiling would pad it to 128 "
                        f"lanes (round-4 OOM regression)")

        # numerics at the many-chunk profile
        out = np.asarray(K.segment_matmul_headed_vjp(
            jnp.asarray(msg), jnp.asarray(alpha),
            jnp.asarray(pack.local_rows), jnp.asarray(pack.tiles),
            n, h))
        rows = np.asarray(K.pack_rows(pack))
        oracle = np.zeros((n, h * dv), np.float32)
        np.add.at(oracle, rows.reshape(-1),
                  (msg * alpha.repeat(dv, axis=2)).reshape(-1, h * dv))
        np.testing.assert_allclose(out, oracle, rtol=2e-4, atol=2e-4)

    def test_weighted_kernel_scalar_operands_stay_2d(self):
        import jax
        import jax.numpy as jnp

        n, e, d = 2048, 30000, 128
        rng = np.random.default_rng(4)
        s = rng.integers(0, n, e).astype(np.int32)
        r = rng.integers(0, n, e).astype(np.int32)
        w = rng.random(e).astype(np.float32)
        x = rng.normal(size=(n, d)).astype(np.float32)
        pack = K.pack_csr(s, r, w, n)
        out = np.asarray(K.spmm_packed(pack, jnp.asarray(x), n))
        oracle = np.zeros((n, d), np.float32)
        np.add.at(oracle, r, w[:, None] * x[s])
        np.testing.assert_allclose(out, oracle, rtol=2e-4, atol=2e-4)
