"""tensordb — training-database generation pipeline (reference
`tensordb/` package): VASP AIMD samplers with task lifecycle, job
parsing/convergence checks (vaspkit), microstructure generators, and
an MD-timestep recommender."""
from .vaspkit import VaspJob, ServiceUnit            # noqa: F401
from .md import recommend_md_timestep                # noqa: F401
from .sampler import (BaseSampler, AimdSampler,      # noqa: F401
                      VaspAimdSampler, ExistedTrajectorySampler)
from .calculator import (BaseCalculator, VaspCalculator,   # noqa: F401
                         VaspAgingCalculator,
                         VaspNonEquilibriumCalculator,
                         VaspPorousCalculator,
                         FibonacciSphereHeliumBubbleInjector)
