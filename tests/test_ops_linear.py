"""Parity: WNLinear / FCNet / SimpleClassifier vs torch weight_norm oracles."""

import numpy as np
import torch
import torch.nn as nn
from torch.nn.utils.weight_norm import weight_norm

import jax
import jax.numpy as jnp

from vqatpu.ops import FCNet, SimpleClassifier, WNLinear
from vqatpu.ops.module import Ctx


def wn_params_from_torch(lin) -> dict:
    """Extract {v, g, b} from a torch weight_norm(Linear, dim=None)."""
    return {
        "v": jnp.asarray(lin.weight_v.detach().numpy()),
        "g": jnp.asarray(lin.weight_g.detach().numpy().reshape(())),
        "b": jnp.asarray(lin.bias.detach().numpy()),
    }


def test_wnlinear_matches_torch(rng):
    torch.manual_seed(0)
    lin = weight_norm(nn.Linear(13, 7), dim=None)
    x = rng.randn(5, 13).astype(np.float32)
    want = lin(torch.from_numpy(x)).detach().numpy()
    got = WNLinear(13, 7).apply(wn_params_from_torch(lin), jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_wnlinear_init_norm():
    p = WNLinear(32, 16).init(jax.random.PRNGKey(0))
    assert np.isclose(float(p["g"]), float(jnp.linalg.norm(p["v"])))
    bound = 1 / np.sqrt(32)
    assert float(jnp.abs(p["v"]).max()) <= bound


def _torch_fcnet(dims, act="ReLU", drop=0.0):
    layers = []
    for i in range(len(dims) - 1):
        if drop > 0:
            layers.append(nn.Dropout(drop))
        layers.append(weight_norm(nn.Linear(dims[i], dims[i + 1]), dim=None))
        if act:
            layers.append(getattr(nn, act)())
    return nn.Sequential(*layers)


def fcnet_params_from_torch(seq) -> dict:
    linears = [m for m in seq if isinstance(m, nn.Linear)]
    return {f"l{i}": wn_params_from_torch(l) for i, l in enumerate(linears)}


def test_fcnet_matches_torch(rng):
    torch.manual_seed(1)
    for dims, act in [((10, 20, 5), "ReLU"), ((8, 8), ""), ((6, 12, 12, 3), "Tanh")]:
        seq = _torch_fcnet(list(dims), act)
        seq.eval()
        x = rng.randn(4, dims[0]).astype(np.float32)
        want = seq(torch.from_numpy(x)).detach().numpy()
        net = FCNet(dims, act, 0.0)
        got = net.apply(fcnet_params_from_torch(seq), jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, err_msg=str(dims))


def test_fcnet_dropout_train_eval():
    net = FCNet((16, 16), "ReLU", 0.5)
    p = net.init(jax.random.PRNGKey(0))
    x = jnp.ones((8, 16))
    eval_out = net.apply(p, x)  # no ctx => eval
    train_out = net.apply(p, x, Ctx(train=True, rng=jax.random.PRNGKey(1)))
    assert not np.allclose(np.asarray(eval_out), np.asarray(train_out))
    # eval deterministic
    np.testing.assert_array_equal(np.asarray(eval_out), np.asarray(net.apply(p, x)))


def test_simple_classifier_matches_torch(rng):
    torch.manual_seed(2)
    l1 = weight_norm(nn.Linear(12, 24), dim=None)
    l2 = weight_norm(nn.Linear(24, 9), dim=None)
    seq = nn.Sequential(l1, nn.ReLU(), nn.Dropout(0.5), l2)
    seq.eval()
    x = rng.randn(3, 12).astype(np.float32)
    want = seq(torch.from_numpy(x)).detach().numpy()
    clf = SimpleClassifier(12, 24, 9, "relu", 0.5)
    p = {"l1": wn_params_from_torch(l1), "l2": wn_params_from_torch(l2)}
    got = clf.apply(p, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-5)


def test_swish_classifier():
    clf = SimpleClassifier(4, 8, 2, "swish", 0.0)
    p = clf.init(jax.random.PRNGKey(3))
    out = clf.apply(p, jnp.ones((2, 4)))
    assert out.shape == (2, 2)
    assert np.all(np.isfinite(np.asarray(out)))


def test_dropout_mask_bits16_unbiased(rng):
    """mask_bits=16 dropout: realized keep fraction matches the quantized
    threshold and the inverted scale keeps the estimator unbiased."""
    import jax
    import jax.numpy as jnp
    from vqatpu.ops.module import Ctx, dropout

    x = jnp.ones((1500, 400))
    for rate in (0.2, 0.5):
        ctx = Ctx(train=True, rng=jax.random.PRNGKey(0), mask_bits=16)
        y = dropout(x, rate, ctx)
        keep = float((np.asarray(y) != 0).mean())
        assert abs(keep - (1.0 - rate)) < 0.01
        assert abs(float(np.asarray(y).mean()) - 1.0) < 0.01
    # eval mode / rate 0: identity regardless of mask_bits
    assert dropout(x, 0.0, Ctx(train=True, rng=jax.random.PRNGKey(0),
                               mask_bits=16)) is x


def test_dropout_mask_replay_bit_equal():
    """The replay VJP (mask regenerated in backward from the saved key) is
    bit-identical to plain AD (mask kept as a residual) in BOTH directions,
    for both mask_bits paths — so mask_replay=True changes no trajectory."""
    import jax
    import jax.numpy as jnp
    from vqatpu.ops.module import Ctx, dropout

    x = jax.random.normal(jax.random.PRNGKey(1), (64, 96))
    ct = jax.random.normal(jax.random.PRNGKey(2), (64, 96))
    for mask_bits in (32, 16):
        for rate in (0.2, 0.5):
            outs = {}
            for replay in (False, True):
                def f(x_):
                    ctx = Ctx(train=True, rng=jax.random.PRNGKey(7),
                              mask_bits=mask_bits, mask_replay=replay)
                    return dropout(x_, rate, ctx)
                y, vjp = jax.vjp(f, x)
                g, = vjp(ct)
                outs[replay] = (np.asarray(y), np.asarray(g))
            assert (outs[False][0] == outs[True][0]).all()
            assert (outs[False][1] == outs[True][1]).all()
