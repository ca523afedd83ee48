"""panfusion-tpu: TPU-native text-to-360-panorama framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of PanFusion
(CVPR 2024, chengzhag/PanFusion). See SURVEY.md at the repo root for the
reference structural analysis this build follows.
"""

__version__ = "0.1.0"
