"""Soft-IntroVAE TPU — a TPU-native JAX/XLA/Pallas framework for introspective VAEs.

A from-scratch rebuild of the capabilities of taldatech/soft-intro-vae-pytorch
(CVPR 2021 Oral, arXiv 2012.13253), designed TPU-first:

* fused ELBO / expELBO loss math in ``ops`` (XLA-fused, Pallas where it pays),
* functional two-optimizer introspective train steps in ``train.step`` that
  compile to a single donated-buffer XLA program,
* SPMD data parallelism over ``jax.sharding.Mesh`` in ``parallel`` (the
  NCCL/DDP equivalent of the reference's style variant),
* model families in ``models`` (MLP toy nets, conv ResNet image nets,
  PointNet-style 3D nets, ALAE-style style nets),
* metrics (FID / JSD / 2D grid metrics) in ``metrics``.

Reference parity notes cite file:line in /root/reference throughout.
"""

__version__ = "0.1.0"
