"""BatchNorm running statistics: torch-semantics parity.

The reference's SpyNet conv blocks (TOF_arch.py:18-27) and discriminators
(discriminator_arch.py:13-40) use nn.BatchNorm2d whose eval mode normalizes
with running averages.  These tests verify (a) the running-stat update rule
matches torch bit-for-bit, (b) reference-trained weights + buffers
reproduce eval outputs through SimpleBlock and the full SpyNet.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from realvsr_tpu.models.common import BatchNorm2d

from reference_loader import import_ref_package


class TestRunningStats:
    def test_update_rule_matches_torch(self):
        tm = torch.nn.BatchNorm2d(5)
        m = BatchNorm2d()
        x1 = np.random.default_rng(0).random((2, 4, 6, 5), np.float32)
        x2 = np.random.default_rng(1).random((2, 4, 6, 5), np.float32)

        variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x1), train=True)
        bs = variables["batch_stats"]
        for x in (x1, x2):
            tm.train()
            t_out = tm(torch.from_numpy(x).permute(0, 3, 1, 2))
            out, mut = m.apply(
                {"params": variables["params"], "batch_stats": bs},
                jnp.asarray(x), train=True, mutable=["batch_stats"])
            bs = mut["batch_stats"]
            np.testing.assert_allclose(
                np.asarray(out),
                t_out.detach().numpy().transpose(0, 2, 3, 1), atol=2e-6)
        np.testing.assert_allclose(np.asarray(bs["mean"]),
                                   tm.running_mean.numpy(), atol=2e-6)
        np.testing.assert_allclose(np.asarray(bs["var"]),
                                   tm.running_var.numpy(), atol=2e-6)

        # eval mode normalizes with the running stats
        tm.eval()
        t_out = tm(torch.from_numpy(x2).permute(0, 3, 1, 2))
        out = m.apply({"params": variables["params"], "batch_stats": bs},
                      jnp.asarray(x2), train=False)
        np.testing.assert_allclose(
            np.asarray(out), t_out.detach().numpy().transpose(0, 2, 3, 1),
            atol=2e-6)

    def test_plain_apply_does_not_require_mutable(self):
        m = BatchNorm2d()
        x = jnp.ones((1, 4, 4, 3))
        variables = m.init(jax.random.PRNGKey(0), x, train=True)
        # train-mode apply without mutable: batch stats used, no write
        out = m.apply(variables, x, train=True)
        assert out.shape == x.shape


def _transfer_conv(tconv, conv_params):
    """Fill our Conv2d subtree ({'Conv_0': {kernel, bias}}) from torch."""
    w = tconv.weight.detach().numpy().transpose(2, 3, 1, 0)
    b = tconv.bias.detach().numpy()
    inner = conv_params["Conv_0"]
    assert w.shape == inner["kernel"].shape and b.shape == inner["bias"].shape
    return {"Conv_0": {"kernel": jnp.asarray(w), "bias": jnp.asarray(b)}}


def _transfer_bn(tbn, p, s):
    p = dict(p, scale=jnp.asarray(tbn.weight.detach().numpy()),
             bias=jnp.asarray(tbn.bias.detach().numpy()))
    s = dict(s, mean=jnp.asarray(tbn.running_mean.numpy()),
             var=jnp.asarray(tbn.running_var.numpy()))
    return p, s


@pytest.mark.slow
class TestEvalParity:
    def test_simple_block_eval_parity(self):
        ref = import_ref_package("models.archs.discriminator_arch")
        from realvsr_tpu.models.discriminators import SimpleBlock

        torch.manual_seed(0)
        depth, nch = 4, 8
        tm = ref.SimpleBlock(depth=depth, n_channels=nch, in_nc=3, out_nc=8)
        # accumulate nontrivial running stats
        tm.train()
        for seed in range(3):
            xb = np.random.default_rng(seed).random((2, 3, 16, 16), np.float32)
            tm(torch.from_numpy(xb))
        tm.eval()

        m = SimpleBlock(depth=depth, n_channels=nch, out_nc=8)
        x = np.random.default_rng(9).random((1, 16, 16, 3), np.float32)
        variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x), train=False)
        params = {k: dict(v) for k, v in variables["params"].items()}
        stats = {k: dict(v) for k, v in variables["batch_stats"].items()}
        seq = tm.simple_block
        # torch indices: conv0→0, conv_i→3i-1 / bn_i→3i, last conv→3(d-1)-1
        for i in range(depth):
            ti = 0 if i == 0 else 3 * i - 1
            params[f"conv{i}"] = _transfer_conv(seq[ti], params[f"conv{i}"])
            if 1 <= i <= depth - 2:
                params[f"bn{i}"], stats[f"bn{i}"] = _transfer_bn(
                    seq[3 * i], params[f"bn{i}"], stats[f"bn{i}"])

        out = m.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x), train=False)
        t_out = tm(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(out), t_out.detach().numpy().transpose(0, 2, 3, 1),
            atol=5e-5)

    def test_spynet_eval_parity(self):
        ref = import_ref_package("models.archs.TOF_arch")
        from realvsr_tpu.models.tof import SpyNet

        torch.manual_seed(1)
        K = 2
        tm = ref.SpyNet(K=K)
        tm.train()
        for seed in range(3):
            a = torch.from_numpy(np.random.default_rng(seed).random(
                (2, 3, 16, 16), np.float32))
            b = torch.from_numpy(np.random.default_rng(seed + 50).random(
                (2, 3, 16, 16), np.float32))
            tm(a, b)
        tm.eval()

        m = SpyNet(K=K)
        rng = np.random.default_rng(77)
        refi = rng.random((1, 16, 16, 3), np.float32)
        nbri = rng.random((1, 16, 16, 3), np.float32)
        variables = m.init(jax.random.PRNGKey(0), jnp.asarray(refi),
                           jnp.asarray(nbri), train=False)
        params = jax.tree_util.tree_map(lambda x: x, variables["params"])
        params = {k: {kk: dict(vv) for kk, vv in v.items()}
                  for k, v in params.items()}
        stats = {k: {kk: dict(vv) for kk, vv in v.items()}
                 for k, v in variables["batch_stats"].items()}
        for j in range(K + 1):
            tblock = (tm.block0 if j == 0 else tm.blocks[j - 1]).block
            fb = f"block{j}"
            for i in range(5):
                params[fb][f"conv{i}"] = _transfer_conv(
                    tblock[3 * i], params[fb][f"conv{i}"])
                if i < 4:
                    params[fb][f"bn{i}"], stats[fb][f"bn{i}"] = _transfer_bn(
                        tblock[3 * i + 1], params[fb][f"bn{i}"],
                        stats[fb][f"bn{i}"])

        warped, flow = m.apply({"params": params, "batch_stats": stats},
                               jnp.asarray(refi), jnp.asarray(nbri),
                               train=False)
        t_warped, t_flow = tm(torch.from_numpy(refi.transpose(0, 3, 1, 2)),
                              torch.from_numpy(nbri.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(flow), t_flow.detach().numpy().transpose(0, 2, 3, 1),
            atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(warped),
            t_warped.detach().numpy().transpose(0, 2, 3, 1), atol=1e-4)
