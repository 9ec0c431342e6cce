import time, numpy as np, jax, jax.numpy as jnp
from gme_tpu.config import GMEConfig
from gme_tpu.models.gme import gme_pipeline_batch

rng = np.random.RandomState(0)
base = rng.randint(0, 256, (1440, 2560), np.uint8)
frames = np.stack([base[i:i+720, 2*i:2*i+1280] for i in range(33)])
cfg = GMEConfig()
dev = jnp.asarray(frames)
B = 8
prev = dev[:32].reshape(4, B, 720, 1280)
curr = dev[1:33].reshape(4, B, 720, 1280)

def run():
    outs = [gme_pipeline_batch(prev[i], curr[i], cfg) for i in range(4)]
    jax.block_until_ready(outs)
    return outs

run()
t0 = time.perf_counter()
outs = run()
dt = time.perf_counter() - t0
print(f"720p: {32/dt:.3f} pairs/s ({dt:.3f}s for 32 pairs)")
psnrs = np.concatenate([np.asarray(o['psnr']) for o in outs])
print("psnr avg", psnrs.mean())
