"""Golden-value tests: our JAX ops vs torch-CPU / cv2 reference behavior.

The reference's compute is cuDNN convs, torch norms/GRU, cv2 homography. The
framework re-implements the semantics; these tests pin them numerically.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from vae_gan_mark_tpu.ops.norms import BatchNorm, InstanceNorm
from vae_gan_mark_tpu.ops.pool import adaptive_avg_pool1d
from vae_gan_mark_tpu.ops.resize import interpolate_bilinear
from vae_gan_mark_tpu.ops.rnn import BiGRU
from vae_gan_mark_tpu.ops.sampling import kl_divergence


def nchw(x_nhwc):
    return torch.tensor(np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2)))


def to_nhwc(t_nchw):
    return np.transpose(t_nchw.detach().numpy(), (0, 2, 3, 1))


class TestBatchNorm:
    def test_train_normalization_and_running_stats(self):
        rng = np.random.default_rng(0)
        x = rng.normal(1.5, 2.0, (4, 8, 6, 5)).astype(np.float32)

        bn = BatchNorm(use_running_average=False)
        variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y, updated = bn.apply(variables, jnp.asarray(x),
                              mutable=["batch_stats"])

        tbn = torch.nn.BatchNorm2d(5)
        tbn.train()
        ty = tbn(nchw(x))

        np.testing.assert_allclose(np.asarray(y), to_nhwc(ty),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(updated["batch_stats"]["mean"]),
            tbn.running_mean.numpy(), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(updated["batch_stats"]["var"]),
            tbn.running_var.numpy(), rtol=1e-4, atol=1e-5)

    def test_eval_uses_running_stats(self):
        rng = np.random.default_rng(1)
        x = rng.normal(0, 1, (2, 4, 4, 3)).astype(np.float32)
        bn = BatchNorm(use_running_average=True)
        variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(x))
        variables = jax.tree.map(lambda v: v, variables)
        stats = {"mean": jnp.array([0.5, -0.5, 1.0]),
                 "var": jnp.array([2.0, 0.5, 1.5])}
        y = bn.apply({"params": variables["params"], "batch_stats": stats},
                     jnp.asarray(x))

        tbn = torch.nn.BatchNorm2d(3)
        tbn.eval()
        tbn.running_mean.data = torch.tensor([0.5, -0.5, 1.0])
        tbn.running_var.data = torch.tensor([2.0, 0.5, 1.5])
        ty = tbn(nchw(x))
        np.testing.assert_allclose(np.asarray(y), to_nhwc(ty),
                                   rtol=1e-4, atol=1e-5)


class TestInstanceNorm:
    def test_matches_torch(self):
        rng = np.random.default_rng(2)
        x = rng.normal(0, 3, (3, 8, 10, 6)).astype(np.float32)
        m = InstanceNorm()
        variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        y = m.apply(variables, jnp.asarray(x))
        tin = torch.nn.InstanceNorm2d(6, affine=True)
        ty = tin(nchw(x))
        np.testing.assert_allclose(np.asarray(y), to_nhwc(ty),
                                   rtol=1e-4, atol=1e-5)


class TestAdaptivePool:
    @pytest.mark.parametrize("in_len,out_len", [(60, 28), (60, 56), (7, 3),
                                                (28, 28)])
    def test_matches_torch(self, in_len, out_len):
        rng = np.random.default_rng(3)
        x = rng.normal(0, 1, (2, in_len, 5)).astype(np.float32)  # (B, L, C)
        y = adaptive_avg_pool1d(jnp.asarray(x), out_len)
        tx = torch.tensor(np.transpose(x, (0, 2, 1)))  # (B, C, L)
        ty = torch.nn.functional.adaptive_avg_pool1d(tx, out_len)
        np.testing.assert_allclose(
            np.asarray(y), np.transpose(ty.numpy(), (0, 2, 1)),
            rtol=1e-5, atol=1e-6)


class TestInterpolate:
    @pytest.mark.parametrize("in_hw,out_hw", [
        ((1, 28), (4, 28)),     # v2 FiLM base -> bottleneck
        ((1, 28), (64, 448)),   # FiLM to full res
        ((4, 28), (1, 56)),     # oldv bottleneck concat (downsample in H!)
        ((4, 28), (32, 224)),
    ])
    def test_matches_torch_bilinear(self, in_hw, out_hw):
        rng = np.random.default_rng(4)
        x = rng.normal(0, 1, (2, in_hw[0], in_hw[1], 3)).astype(np.float32)
        y = interpolate_bilinear(jnp.asarray(x), out_hw[0], out_hw[1])
        ty = torch.nn.functional.interpolate(
            nchw(x), size=out_hw, mode="bilinear", align_corners=False)
        np.testing.assert_allclose(np.asarray(y), to_nhwc(ty),
                                   rtol=1e-4, atol=1e-5)


class TestBiGRU:
    def test_matches_torch_gru(self):
        """Port torch-initialized weights into our BiGRU; outputs must match."""
        b, length, emb, hidden, layers = 2, 12, 8, 16, 2
        tg = torch.nn.GRU(emb, hidden, num_layers=layers, batch_first=True,
                          bidirectional=True, dropout=0.0)
        tg.eval()
        rng = np.random.default_rng(5)
        x = rng.normal(0, 1, (b, length, emb)).astype(np.float32)
        with torch.no_grad():
            ty, _ = tg(torch.tensor(x))

        model = BiGRU(hidden=hidden, num_layers=layers, dropout=0.0,
                      train=False)
        variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
        params = jax.tree.map(np.asarray, variables["params"])
        # torch GRU weights: weight_ih_l{k}{_reverse}: (3H, in), gate order
        # r,z,n; ours: w_ih (in, 3H) same gate order.
        for layer in range(layers):
            for direction, suffix in ((f"l{layer}_fwd", ""),
                                      (f"l{layer}_bwd", "_reverse")):
                params[direction]["w_ih"] = getattr(
                    tg, f"weight_ih_l{layer}{suffix}").detach().numpy().T
                params[direction]["w_hh"] = getattr(
                    tg, f"weight_hh_l{layer}{suffix}").detach().numpy().T
                params[direction]["b_ih"] = getattr(
                    tg, f"bias_ih_l{layer}{suffix}").detach().numpy()
                params[direction]["b_hh"] = getattr(
                    tg, f"bias_hh_l{layer}{suffix}").detach().numpy()
        y = model.apply({"params": params}, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(y), ty.numpy(),
                                   rtol=1e-4, atol=1e-5)


class TestKL:
    def test_matches_reference_formula(self):
        rng = np.random.default_rng(6)
        mu = rng.normal(0, 1, (4, 1, 1, 128)).astype(np.float32)
        logvar = rng.normal(0, 0.5, (4, 1, 1, 128)).astype(np.float32)
        got = kl_divergence(jnp.asarray(mu), jnp.asarray(logvar))
        tmu = torch.tensor(mu)
        tlv = torch.tensor(logvar)
        # Reference formula (vae-gan.py:420), dims [1,2,3] are non-batch.
        ref = -0.5 * torch.mean(1 + tlv - tmu.pow(2) - tlv.exp(),
                                dim=[1, 2, 3])
        ref = torch.mean(ref)
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-5)


class TestSpectralNorm:
    def test_matches_torch_spectral_norm(self):
        """Port a torch conv weight + u vector; after one power iteration the
        normalized weights must match torch.nn.utils.spectral_norm."""
        from vae_gan_mark_tpu.ops.norms import spectral_normalize
        torch.manual_seed(0)
        conv = torch.nn.Conv2d(3, 8, 4, 2, 1, bias=False)
        sn_conv = torch.nn.utils.spectral_norm(conv)
        u_before = sn_conv.weight_u.detach().numpy().copy()
        w_orig = sn_conv.weight_orig.detach().numpy().copy()
        sn_conv.train()
        x = torch.randn(1, 3, 16, 16)
        _ = sn_conv(x)  # one forward = one power iteration
        w_sn_torch = sn_conv.weight.detach().numpy()    # (out, in, kh, kw)
        u_after = sn_conv.weight_u.detach().numpy()

        # Run our power iteration from the SAME initial u (torch updates u
        # and v first, then sigma = u_new . W v — exactly update=True here).
        # The matrix flattening orders differ (in*kh*kw vs kh*kw*in) but u,
        # sigma, and the normalized weight are column-permutation-invariant.
        kernel = jnp.asarray(np.transpose(w_orig, (2, 3, 1, 0)))  # HWIO
        w_ours, u_new = spectral_normalize(
            kernel, jnp.asarray(u_before), update=True)
        w_ours_oihw = np.transpose(np.asarray(w_ours), (3, 2, 0, 1))
        np.testing.assert_allclose(w_ours_oihw, w_sn_torch,
                                   rtol=1e-3, atol=1e-5)
        np.testing.assert_allclose(np.asarray(u_new), u_after,
                                   rtol=1e-3, atol=1e-5)

    def test_power_iteration_converges_to_sigma(self):
        """Repeated iterations approach the true spectral norm."""
        from vae_gan_mark_tpu.ops.norms import spectral_normalize
        import jax.numpy as jnp
        rng = np.random.default_rng(0)
        kernel = jnp.asarray(rng.normal(0, 1, (3, 3, 4, 6)), np.float32)
        u = jnp.asarray(rng.normal(0, 1, (6,)), np.float32)
        u = u / np.linalg.norm(np.asarray(u))
        for _ in range(50):
            w_sn, u = spectral_normalize(kernel, u, update=True)
        # The normalized weight's largest singular value must be ~1.
        mat = np.asarray(w_sn).transpose(3, 0, 1, 2).reshape(6, -1)
        sigma = np.linalg.svd(mat, compute_uv=False)[0]
        assert abs(sigma - 1.0) < 1e-3, sigma


class TestLanePaddedConv:
    """LanePaddedConv (ops/convblocks.py) must be a drop-in for nn.Conv:
    identical parameter tree/init, and identical outputs — bit-exact on CPU,
    where the fast tier and the multichip dryrun run."""

    @pytest.mark.parametrize("ksize,pad", [((1, 1), "VALID"),
                                           ((3, 3), ((1, 1), (1, 1)))])
    def test_matches_nn_conv(self, ksize, pad):
        from flax import linen as nn
        from vae_gan_mark_tpu.ops.convblocks import LanePaddedConv
        from vae_gan_mark_tpu.ops.precision import precision_for

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(0, 1, (2, 8, 16, 64)), jnp.float32)
        ref = nn.Conv(3, ksize, padding=pad,
                      precision=precision_for(jnp.float32),
                      param_dtype=jnp.float32)
        new = LanePaddedConv(3, ksize, padding=pad)
        p_ref = ref.init(jax.random.PRNGKey(0), x)
        p_new = new.init(jax.random.PRNGKey(0), x)
        assert (jax.tree_util.tree_structure(p_ref)
                == jax.tree_util.tree_structure(p_new))
        for a, b in zip(jax.tree.leaves(p_ref), jax.tree.leaves(p_new)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        tol = dict(rtol=0, atol=0) if jax.default_backend() == "cpu" \
            else dict(rtol=2e-2, atol=2e-2)
        np.testing.assert_allclose(np.asarray(new.apply(p_ref, x)),
                                   np.asarray(ref.apply(p_ref, x)), **tol)
        # bf16 production mode: padded lanes, still the same values.
        newb = LanePaddedConv(3, ksize, padding=pad, dtype=jnp.bfloat16)
        refb = nn.Conv(3, ksize, padding=pad, dtype=jnp.bfloat16,
                       param_dtype=jnp.float32)
        np.testing.assert_allclose(
            np.asarray(newb.apply(p_ref, x.astype(jnp.bfloat16)),
                       np.float32),
            np.asarray(refb.apply(p_ref, x.astype(jnp.bfloat16)),
                       np.float32), rtol=2e-2, atol=2e-2)

    def test_gradients_flow(self):
        from vae_gan_mark_tpu.ops.convblocks import LanePaddedConv
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.normal(0, 1, (2, 4, 8, 16)), jnp.float32)
        m = LanePaddedConv(3, (1, 1))
        p = m.init(jax.random.PRNGKey(0), x)
        g = jax.grad(lambda p: float(0) + jnp.sum(
            jnp.sin(m.apply(p, x))))(p)
        assert float(jnp.linalg.norm(g["params"]["kernel"])) > 0
        assert float(jnp.linalg.norm(g["params"]["bias"])) > 0
