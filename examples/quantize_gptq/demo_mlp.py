# %%
"""Minimal GPTQ walkthrough on a toy MLP (reference analog:
/root/reference/examples/quantize_gptq/mnist.py — its MNIST demo + ONNX
parity check; here synthetic data + a StableHLO export round-trip).

Demonstrates the full GPTQ flow in isolation: calibrate → Hessian →
quantize → swap → verify — and that the quantized model exports/reloads
through `jax.export` with identical outputs.
"""
import numpy as np
import jax
import jax.numpy as jnp

from chatglm_q_tpu.config import TpuRuntimeConfig
from chatglm_q_tpu.ops.linear import quant_linear
from chatglm_q_tpu.quant import gptq as G

rt = TpuRuntimeConfig(use_pallas=None)

# %% toy 2-layer MLP on a synthetic classification task
key = jax.random.PRNGKey(0)
D_IN, D_H, D_OUT = 256, 512, 10
w1 = jax.random.normal(key, (D_IN, D_H)) * 0.05
w2 = jax.random.normal(jax.random.PRNGKey(1), (D_H, D_OUT)) * 0.05


def mlp(x, p1, p2, quant_type):
    h = jax.nn.relu(quant_linear(x, p1, quant_type, rt))
    return quant_linear(h, p2, quant_type, rt)


# calibration inputs with correlated features (where GPTQ matters)
base = jax.random.normal(jax.random.PRNGKey(2), (512, D_IN // 4))
mix = jax.random.normal(jax.random.PRNGKey(3), (D_IN // 4, D_IN))
X = base @ mix + 0.1 * jax.random.normal(jax.random.PRNGKey(4), (512, D_IN))

# %% accumulate Hessians with functional taps (no hooks)
H1, n1 = G.init_hessian(D_IN)
H1, n1 = G.accumulate_hessian(H1, n1, X)
hidden = jax.nn.relu(X @ w1)
H2, n2 = G.init_hessian(D_H)
H2, n2 = G.accumulate_hessian(H2, n2, hidden)

# %% quantize both layers int4g32 via GPTQ, and naive RTN for comparison
p1_gptq = G.gptq_linear_params_int4(w1, H1)
p2_gptq = G.gptq_linear_params_int4(w2, H2)

from chatglm_q_tpu.ops import quant as Q

p1_rtn = Q.quantize_linear_int4(w1)
p2_rtn = Q.quantize_linear_int4(w2)

ref = mlp(X, {"weight": w1}, {"weight": w2}, "none")
out_gptq = mlp(X, p1_gptq, p2_gptq, "int4g32")
out_rtn = mlp(X, p1_rtn, p2_rtn, "int4g32")
err_g = float(jnp.mean((out_gptq - ref) ** 2))
err_r = float(jnp.mean((out_rtn - ref) ** 2))
print(f"output MSE — gptq: {err_g:.6f}  rtn: {err_r:.6f}  "
      f"(gptq {'BETTER' if err_g < err_r else 'worse'})")

# %% export the quantized model (the reference checks torch↔ONNX parity,
# mnist.py:56-57; here jax.export round-trip)
from jax import export as jexport

fn = jax.jit(lambda x, p1, p2: mlp(x, p1, p2, "int4g32"))
exported = jexport.export(fn)(X[:8], p1_gptq, p2_gptq)
blob = exported.serialize()
reloaded = jexport.deserialize(blob)
out2 = reloaded.call(X[:8], p1_gptq, p2_gptq)
np.testing.assert_allclose(np.asarray(out_gptq[:8]), np.asarray(out2), rtol=1e-4, atol=1e-4)
print(f"StableHLO export round-trip OK ({len(blob)/1e3:.0f} kB)")
