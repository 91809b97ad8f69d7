"""Canonical DANN mechanism test: with grad_reverse in the loop, minimizing
the domain loss must ALIGN the two domains' features (the gradient-reversal
minimax), not separate them.  2-D toy, closed-loop SGD."""

import jax
import jax.numpy as jnp
import numpy as np

from ta3n_tpu.ops import grad_reverse


def test_dann_toy_aligns_domains():
    rng = np.random.default_rng(0)
    xs = rng.normal(size=(256, 2)).astype("float32")
    xt = (rng.normal(size=(256, 2))
          + np.array([4.0, 0.0])).astype("float32")

    k1, k2 = jax.random.split(jax.random.PRNGKey(0))
    p = {"W": jax.random.normal(k1, (2, 2)) * 0.5, "b": jnp.zeros(2),
         "D": jax.random.normal(k2, (2, 1)) * 0.5, "c": jnp.zeros(1)}

    def domain_loss(p, beta):
        f = jnp.concatenate([xs @ p["W"] + p["b"], xt @ p["W"] + p["b"]])
        f = grad_reverse(f, beta)
        logit = (f @ p["D"] + p["c"])[:, 0]
        lab = jnp.concatenate([jnp.zeros(256), jnp.ones(256)])
        # stable sigmoid BCE
        return jnp.mean(jnp.maximum(logit, 0) - logit * lab
                        + jnp.log1p(jnp.exp(-jnp.abs(logit))))

    def gap(p):
        fs = xs @ p["W"] + p["b"]
        ft = xt @ p["W"] + p["b"]
        return float(jnp.linalg.norm(fs.mean(0) - ft.mean(0)))

    g0 = gap(p)
    step = jax.jit(jax.grad(domain_loss))
    for _ in range(1500):
        g = step(p, 1.0)
        p = jax.tree_util.tree_map(lambda a, b: a - 0.05 * b, p, g)
    g1 = gap(p)
    assert g1 < 0.1 * g0, f"features did not align: {g0} -> {g1}"

    # with beta = 0 the features must NOT move at all
    p2 = {"W": jax.random.normal(k1, (2, 2)) * 0.5, "b": jnp.zeros(2),
          "D": jax.random.normal(k2, (2, 1)) * 0.5, "c": jnp.zeros(1)}
    w_before = np.asarray(p2["W"]).copy()
    for _ in range(50):
        g = step(p2, 0.0)
        p2 = jax.tree_util.tree_map(lambda a, b: a - 0.05 * b, p2, g)
    np.testing.assert_array_equal(np.asarray(p2["W"]), w_before)
