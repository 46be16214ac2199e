import sys
sys.path.insert(0, '/root/repo')
import os
os.chdir('/root/repo/artifacts/snap_moni_v3')
import glob
import jax
jax.config.update('jax_platforms','cpu')
import numpy as np
from tensoralloy_tpu.train.manager import TrainingManager
mgr = TrainingManager("input.toml")
ds = mgr.dataset
feats, labels = ds.build()
tf_, tl_, ef_, el_ = ds.split(feats, labels)
trainer = mgr.trainer
ckpts = sorted(glob.glob(os.path.join(mgr.model_dir, "ckpt-*.npz")),
               key=lambda p: int(p.split("-")[-1].split(".")[0]))
tmpl = mgr.model.init_params(jax.random.PRNGKey(0))
params, ema, step = trainer.load_checkpoint(ckpts[-1], tmpl)
print("ckpt step", step)
from tensoralloy_tpu.nn.fields import EV_ANGSTROM3_TO_GPA as GPA

efs = mgr.model.make_batched_efs() if hasattr(mgr.model, 'make_batched_efs') else None
# fall back: per-frame efs via vmap over the batch axis
from tensoralloy_tpu.nn.fields import make_efs_fn
efs1 = make_efs_fn(mgr.model.variational_energy)
import jax.numpy as jnp
# jit ONCE over the feature pytree (indexing outside the jit — the
# old version jitted a closure over i, which would retrace per frame,
# and then called the unjitted function anyway)
frame_j = jax.jit(lambda f: efs1(ema, f)["stress_voigt"])
errs = []
lbl = np.asarray(el_["stress"]) * GPA
for i in range(len(lbl)):
    f_i = {k: jnp.asarray(v[i]) for k, v in ef_.items()}
    prd = np.asarray(frame_j(f_i)) * GPA
    errs.append(np.abs(prd - lbl[i]).mean())
errs = np.asarray(errs)
order = np.argsort(errs)[::-1]
print("per-frame stress MAE GPa: mean", errs.mean().round(3), "median", np.median(errs).round(3))
print("p90", np.percentile(errs,90).round(2), "max", errs.max().round(2))
print("top-5 worst frames:", [(int(i), float(errs[i].round(2)), float(np.abs(lbl[i]).max().round(1))) for i in order[:5]])
lblmax = np.abs(lbl).max(axis=1)
lo = lblmax < 5.0
print(f"frames with |s|max<5GPa: {lo.sum()}, their stress MAE: {errs[lo].mean().round(3)} GPa")
hi = ~lo
print(f"frames with |s|max>=5GPa: {hi.sum()}, their stress MAE: {errs[hi].mean().round(3)} GPa")
