"""sleekit-tpu: TPU-native weight-only quantization + quantized inference.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
Coloquinte/sleekit reference toolkit (post-training weight-only quantization:
streaming Hessian statistics, arbitrary codebooks, GPTQ/OBQ error-compensating
solver, Hessian-aware scaling search, local-search refinement), extended with
a packed-weight format, fused dequant+matmul Pallas kernels and a sharded
serving engine that the reference deliberately leaves out.

Layer map (mirrors reference layering, see /root/repo/SURVEY.md §1):
  codebooks   - reference sleekit/codebook.py semantics, as JAX pytrees
  hessian     - reference sleekit/statistics.py accumulation + obq.py helpers
  solver      - reference sleekit/obq.py GPTQ/OBQ core, blocked lax loops
  scaling     - reference sleekit/scaling.py, grid search vmapped on device
  local_search- reference sleekit/obq.py local search, incremental gains
  pipeline    - reference sleekit/statistics.py Sleekit orchestration+presets
  ops         - packing + fused dequant-matmul kernels (new, no ref analogue)
  models      - Flax OPT/BLOOM/Llama + calibration harness (new)
  serve       - quantized serving engine (new)
  parallel    - mesh/sharding utilities (new)
"""

from sleekit_tpu import codebooks, hessian, solver, scaling, local_search, pipeline
from sleekit_tpu.codebooks import UniformCodebook, Codebook, lloyd_max
from sleekit_tpu.compat import Sleekit
from sleekit_tpu.pipeline import LayerQuantizer, QuantConfig

__version__ = "0.1.0"

__all__ = [
    "codebooks",
    "hessian",
    "solver",
    "scaling",
    "local_search",
    "pipeline",
    "UniformCodebook",
    "Codebook",
    "lloyd_max",
    "LayerQuantizer",
    "QuantConfig",
    "Sleekit",
]
