import sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_bench_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
import flax.serialization as fser
from fpmatch_tpu.core.config import Config, default_stages
from fpmatch_tpu.models.ngm import NGMNet
from fpmatch_tpu.data.synthetic import synthetic_pair_batch
from fpmatch_tpu.train.state import create_state
from fpmatch_tpu.train.step import make_train_step
from fpmatch_tpu.utils.profiling import trace

cfg = Config()
batch = synthetic_pair_batch(cfg, batch_size=8, genuine_ratio=0.5, seed=0)
model = NGMNet(cfg)
cpu = jax.devices("cpu")[0]
with jax.default_device(cpu):
    batch_cpu = jax.device_put(batch, cpu)
    shapes = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), batch_cpu, train=False))
    variables = fser.from_bytes(shapes, open("/root/repo/.jax_bench_cache/model_stage_init.msgpack","rb").read())
variables = jax.device_put(variables, jax.devices()[0])
fwd = jax.jit(lambda v, b: model.apply(v, b, train=False)["cls_prob"])
jax.block_until_ready(fwd(variables, batch))
stage = default_stages()[2]
step = jax.jit(make_train_step(model, stage, jit=False))
state = create_state(variables, stage)
jax.block_until_ready(step(state, batch)[1]["total_loss"])
print("compiled; tracing", flush=True)
with trace("/tmp/jaxtrace2"):
    for _ in range(3):
        out = fwd(variables, batch)
    jax.block_until_ready(out)
    for _ in range(3):
        ns, m = step(state, batch)
    jax.block_until_ready(m["total_loss"])
print("trace done", flush=True)
