import json
import numpy as np
from smart_nar_fast_tts_tpu.cli._args import enable_compilation_cache
enable_compilation_cache()
import jax
import jax.numpy as jnp
from smart_nar_fast_tts_tpu import benchmarking as bm
from smart_nar_fast_tts_tpu.ops.pallas.attention import (flash_attention,
                                                         _attention_reference)

rng = np.random.default_rng(0)
B, H, T, D = 8, 2, 1000, 128
q = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
k = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
v = jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
kv = jnp.ones((B, T), bool)

flash = jax.jit(lambda q, k, v: flash_attention(q, k, v, kv, 256, 256, False))
ref = jax.jit(lambda q, k, v: _attention_reference(q, k, v, kv))

for name, f in (("flash_pallas", flash), ("xla_einsum", ref)):
    step = lambda c, f=f: bm.collapse(f(bm.taint(q, c), k, v), c)
    m = bm.seconds_per_iteration(step, k_hi=33)
    flops = 2 * 2 * B * H * T * T * D
    print(json.dumps({"stage": name, "ms": round(m.seconds*1e3, 4),
                      "tflops": round(flops/m.seconds/1e12, 1)}), flush=True)

# long-form shapes: where does flash overtake einsum?
for T2, B2 in ((2048, 2), (4096, 2)):
    q2 = jnp.asarray(rng.normal(size=(B2, H, T2, D)), jnp.float32)
    k2 = jnp.asarray(rng.normal(size=(B2, H, T2, D)), jnp.float32)
    v2 = jnp.asarray(rng.normal(size=(B2, H, T2, D)), jnp.float32)
    kv2 = jnp.ones((B2, T2), bool)
    fl = jax.jit(lambda q, k, v, kv=kv2: flash_attention(q, k, v, kv, 256, 256, False))
    rf = jax.jit(lambda q, k, v, kv=kv2: _attention_reference(q, k, v, kv))
    for name, f in (("flash", fl), ("einsum", rf)):
        step = lambda c, f=f: bm.collapse(f(bm.taint(q2, c), k2, v2), c)
        m = bm.seconds_per_iteration(step, k_hi=17)
        flops = 2 * 2 * B2 * H * T2 * T2 * D
        print(json.dumps({"stage": f"{name}_T{T2}_B{B2}",
                          "ms": round(m.seconds*1e3, 4),
                          "tflops": round(flops/m.seconds/1e12, 1)}), flush=True)
