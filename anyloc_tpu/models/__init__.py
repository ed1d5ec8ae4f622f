"""Model zoo: one Flax ViT trunk parameterized per family (DINOv2, DINO v1,
CLIP, MAE, SAM, CosPlace-ViT, ImageBind-vision) + torch checkpoint converters.
"""

from anyloc_tpu.models.vit import ViT, ViTConfig
from anyloc_tpu.models.extractor import DinoV2ExtractFeatures, ViTFacetExtractor
from anyloc_tpu.models import registry

__all__ = [
    "ViT",
    "ViTConfig",
    "DinoV2ExtractFeatures",
    "ViTFacetExtractor",
    "registry",
]
