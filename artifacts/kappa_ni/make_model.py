"""Save a zjw04 Ni EAM model for the kappa production run."""
import sys
sys.path.insert(0, "/root/repo")
import jax
from collections import Counter
from tensoralloy_tpu.transform import Featurizer
from tensoralloy_tpu.nn.eam import EamAlloyNN
from tensoralloy_tpu.io.model import save_model

fz = Featurizer(["Ni"], rcut=6.0)
model = EamAlloyNN(fz, Counter({"Ni": 4}), custom_potentials="zjw04")
params = model.init_params(jax.random.PRNGKey(0))
save_model("/root/repo/artifacts/kappa_ni/ni_zjw04.npz", model,
           jax.device_get(params))
print("saved")
