"""pytorchcv_tpu — a TPU-native (JAX/XLA/Pallas) computer-vision model zoo
with the capabilities of osmr/pytorchcv.

Layout is NHWC throughout; models are flax.linen modules whose parameter
trees mirror the reference's checkpoint structure so released ``.pth``
weights convert generically.
"""

__version__ = "0.1.0"

from .model import Model
from .model_provider import get_model, ptcv_get_model
from .models import registered_models

__all__ = ["Model", "get_model", "ptcv_get_model", "registered_models",
           "__version__"]
