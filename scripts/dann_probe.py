"""Fast minimal-DANN probe on the rotation-shift task: a 2-layer MLP +
GRL domain head, full-batch training — used to calibrate the task
(angle / centroid scale) for the full-pipeline benchmark
(scripts/da_wins_experiment.py, tests/test_da_improves_target.py)
without paying the Trainer's compile/epoch cost per configuration."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from ta3n_tpu.data.synthetic import _rotation_matrix
from ta3n_tpu.ops import grad_reverse


def make(num_class, D, angle, n, seed, scale, task_seed=0):
    rng = np.random.default_rng(seed)
    cen = np.random.default_rng(9999 + task_seed).normal(
        size=(num_class, D))
    cen *= scale / np.linalg.norm(cen, axis=1, keepdims=True).mean()
    R = _rotation_matrix(D, angle, 777 + task_seed)
    ys = np.arange(n) % num_class
    xs = cen[ys] + rng.normal(size=(n, D))
    yt = np.arange(n) % num_class
    xt = (cen[yt] + rng.normal(size=(n, D))) @ R.T
    return (xs.astype(np.float32), ys.astype(np.int32),
            xt.astype(np.float32), yt.astype(np.int32))


def init(key, D, H, C):
    ks = jax.random.split(key, 8)
    g = lambda k, a, b: jax.random.normal(k, (a, b)) * (2.0 / a) ** 0.5
    return {"W1": g(ks[0], D, H), "b1": jnp.zeros(H),
            "W2": g(ks[1], H, H), "b2": jnp.zeros(H),
            "Wc": g(ks[2], H, C), "bc": jnp.zeros(C),
            "Wd1": g(ks[3], H, H), "bd1": jnp.zeros(H),
            "Wd2": g(ks[4], H, 2), "bd2": jnp.zeros(2)}


def feat(p, x):
    h = jax.nn.relu(x @ p["W1"] + p["b1"])
    return jax.nn.relu(h @ p["W2"] + p["b2"])


def run(angle, scale, num_class=4, D=16, H=32, beta_max=1.0, steps=4000,
        lr=0.02, use_da=True, seed=0, n=256):
    xs, ys, xt, yt = make(num_class, D, angle, n, seed + 100, scale)
    p = init(jax.random.PRNGKey(seed), D, H, num_class)

    def loss_fn(p, beta):
        fs, ft = feat(p, xs), feat(p, xt)
        logit = fs @ p["Wc"] + p["bc"]
        ce = -jnp.mean(jax.nn.log_softmax(logit)[jnp.arange(len(ys)), ys])
        if not use_da:
            return ce
        f = grad_reverse(jnp.concatenate([fs, ft]), beta)
        h = jax.nn.relu(f @ p["Wd1"] + p["bd1"])
        dl = h @ p["Wd2"] + p["bd2"]
        lab = jnp.concatenate([jnp.zeros(len(xs), jnp.int32),
                               jnp.ones(len(xt), jnp.int32)])
        dce = -jnp.mean(jax.nn.log_softmax(dl)[jnp.arange(len(lab)), lab])
        return ce + dce

    @jax.jit
    def step(p, m, beta, lr_t):
        g = jax.grad(loss_fn)(p, beta)
        m = jax.tree_util.tree_map(lambda mm, gg: 0.9 * mm + gg, m, g)
        p = jax.tree_util.tree_map(lambda pp, mm: pp - lr_t * mm, p, m)
        return p, m

    m = jax.tree_util.tree_map(jnp.zeros_like, p)
    for i in range(steps):
        prog = i / steps
        beta = beta_max * (2.0 / (1.0 + np.exp(-10 * prog)) - 1.0)
        p, m = step(p, m, jnp.float32(beta),
                    jnp.float32(lr / (1 + 10 * prog) ** 0.75))
    ft = feat(p, xt)
    return float(jnp.mean(jnp.argmax(ft @ p["Wc"] + p["bc"], 1) == yt))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--angles", type=float, nargs="+",
                    default=[60, 70, 75, 80])
    ap.add_argument("--scale", type=float, default=4.0)
    ap.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    args = ap.parse_args()
    for angle in args.angles:
        rows = []
        for seed in args.seeds:
            so = run(angle, args.scale, use_da=False, seed=seed)
            da = run(angle, args.scale, use_da=True, seed=seed)
            rows.append((so, da))
        srcs = ", ".join(f"{r[0]:.2f}" for r in rows)
        das = ", ".join(f"{r[1]:.2f}" for r in rows)
        gmin = min(r[1] - r[0] for r in rows)
        print(f"angle {angle}: src [{srcs}]  dann [{das}]  "
              f"min_gain {gmin:+.2f}")
