"""QuickPrefill: grouped prefill engine with KV pruning + decode loop."""

from quickvideo_tpu.prefill.engine import LVUEngine, PrefillInputs
