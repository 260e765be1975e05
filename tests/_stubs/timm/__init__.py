"""Minimal timm stand-in so the REFERENCE's own model files import in this
environment (timm is not installed; zero egress).

Only what the reference touches is provided, numerically faithful to
timm's implementations so golden-parity tests against
/root/reference/geo_deep_learning/models/** are meaningful:

- ``timm.layers``: DropPath, to_2tuple, trunc_normal_
  (used by reference models/encoders/mix_transformer.py:10)
- ``timm.models.vision_transformer.Block`` with timm's Attention /
  LayerScale / Mlp composition and parameter names
  (used by reference models/encoders/dofa_v2.py:5)

This is TEST SCAFFOLDING — never imported by the framework itself.
"""
