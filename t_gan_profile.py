import time, jax, jax.numpy as jnp
from torchsde_tpu.models import sde_gan as G

key = jax.random.PRNGKey(0)
B, T = 1024, 64
ts, data = G.get_ou_data(jax.random.fold_in(key, 1), B, T)
gen = G.Generator(jax.random.fold_in(key, 2), 1, 5, 3, 16, 16, 1)
disc = G.Discriminator(jax.random.fold_in(key, 3), 1, 16, 16, 1)
real = data[:B]
k = jax.random.fold_in(key, 4)

def chain(fn, n=24):
    s = fn(jnp.float32(0.0)); float(s)
    t0 = time.perf_counter()
    for _ in range(n): s = fn(s)
    float(s)
    return (time.perf_counter() - t0) / n * 1e3

def loss_with(adjoint):
    def loss(g_, d_, s):
        fake = g_(k, ts, B, dt=1.0, adjoint=adjoint)
        both = jnp.concatenate([fake, real + 0*s], axis=0)
        sc = d_.scores(ts, both, dt=1.0, adjoint=adjoint)
        return jnp.mean(sc[:B]) - jnp.mean(sc[B:])
    return loss

def grad_probe(adjoint):
    def probe(s):
        gg, gd = jax.grad(loss_with(adjoint), argnums=(0, 1))(gen, disc, s)
        leaves = jax.tree_util.tree_leaves(gg) + jax.tree_util.tree_leaves(gd)
        return sum(jnp.sum(l) for l in leaves)
    return jax.jit(probe)

print(f"grads, reversible-heun adjoint : {chain(grad_probe(True)):6.2f} ms")
print(f"grads, backprop-through-solver : {chain(grad_probe(False)):6.2f} ms")
