import time, sys
import numpy as np, jax, jax.numpy as jnp

N, E, D, H = int(sys.argv[1]), int(sys.argv[2]), 128, 4
rng = np.random.default_rng(0)
s = np.minimum((rng.random(E) ** 2 * N).astype(np.int32), N - 1)
r = np.minimum((rng.random(E) ** 2 * N).astype(np.int32), N - 1)
x = rng.normal(size=(N, D)).astype(np.float32)
t = time.perf_counter()
from graphgym_tpu.graphs.container import build_graph_batch
from graphgym_tpu.graphs.packing import build_packs
batch = build_graph_batch(s, r, x, pad_nodes_to=N + 1, pad_edges_to=E)
print("batch", time.perf_counter() - t, flush=True); t = time.perf_counter()
packs = build_packs(np.asarray(batch.senders), np.asarray(batch.receivers),
                    np.asarray(batch.edge_weight), np.asarray(batch.node_mask),
                    int(batch.num_nodes), kinds=("att",))
batch = batch.replace(packs=packs)
print("packs", time.perf_counter() - t, flush=True); t = time.perf_counter()
from graphgym_tpu.nn.layers import GATConv
model = GATConv(dim_out=D, heads=H)
variables = model.init(jax.random.PRNGKey(0), batch, False)
print("init", time.perf_counter() - t, flush=True); t = time.perf_counter()
def loss_fn(v, b):
    out = model.apply(v, b, False)
    return jnp.sum(out.node_feat ** 2)
step = jax.jit(jax.grad(loss_fn))
g = step(variables, batch); jax.block_until_ready(g)
print("compile", time.perf_counter() - t, flush=True)
iters = 10
t0 = time.perf_counter()
for _ in range(iters):
    g = step(variables, batch)
jax.block_until_ready(g)
dt = (time.perf_counter() - t0) / iters
print(f"GATConv fwd+bwd: {dt*1e3:.2f} ms, {(E+N)/dt/1e6:.1f}M edges/s")
