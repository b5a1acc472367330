"""ssl4polyp_tpu — a TPU-native SSL-for-polyp-classification framework.

A ground-up JAX/XLA/Pallas/pjit re-design of the capability surface of the
SSL4POLYP study framework (reference: irconde/SSL4POLYP):

* MAE (masked autoencoder) pretraining of ViT-B/16 on unlabeled endoscopy
  frames, data-parallel over a TPU mesh (reference:
  ``src/ssl4polyp/models/mae/main_pretrain.py``).
* A classification fine-tuning / evaluation / analysis stack comparing
  pretraining schemes across seven experiment protocols on SUN and PolypGen
  data packs (reference: ``src/ssl4polyp/classification/``).

Subpackages
-----------
``configs``      layered YAML configuration and data-pack manifests
``data``         host-side data engine + on-device augmentation
``models``       functional ViT / MAE model cores (pure pytrees)
``ops``          Pallas TPU kernels for the hot compute path
``parallel``     mesh construction and sharding rules
``training``     MAE pretraining and classification fine-tuning engines
``metrics``      metric suite and decision-threshold policies
``evaluation``   standalone evaluation CLI and artifact exporters
``analysis``     guardrailed result loading, bootstrap, per-experiment reports
``polypdb``      offline dataset corruption tooling
``utils``        logging, determinism, checkpoint helpers
"""

__version__ = "0.1.0"

# Honor JAX_PLATFORMS before any backend touch: the terminal sitecustomize
# pins jax_platforms to the axon backend, which otherwise overrides the
# documented CPU-mesh recipe and hangs every CLI when the TPU relay is down.
from ssl4polyp_tpu.utils.platform import honor_platform_env as _honor_platform_env

_honor_platform_env()
