import os
from contextlib import contextmanager


def initialize(models, optimizers=None, opt_level="O0", **kwargs):
    # REFBENCH_BN_FREEZE=1: pin every BatchNorm's running stats (momentum=0)
    # for the converged-checkpoint eval experiment (tools/ref_eval_ckpt.py).
    # The reference keeps its frozen VGG in train() mode (model.py:59 sets
    # requires_grad=False but never eval()), so the lr=0 warmup steps before
    # its first validation would otherwise momentum-blend the exported
    # running stats with live batch stats — stats the vqa_tpu frozen-backbone
    # training never updates. Off by default; reference semantics unchanged.
    if os.environ.get("REFBENCH_BN_FREEZE"):
        import torch.nn as nn

        for m in (models if isinstance(models, (list, tuple)) else [models]):
            for mod in m.modules():
                if isinstance(mod, (nn.BatchNorm1d, nn.BatchNorm2d,
                                    nn.BatchNorm3d)):
                    mod.momentum = 0.0
    return (models, optimizers) if optimizers is not None else models


@contextmanager
def scale_loss(loss, optimizer, **kwargs):
    yield loss
