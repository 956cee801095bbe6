from contextlib import contextmanager


def initialize(models, optimizers=None, opt_level="O0", **kwargs):
    return (models, optimizers) if optimizers is not None else models


@contextmanager
def scale_loss(loss, optimizer, **kwargs):
    yield loss
