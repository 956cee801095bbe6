"""tensorboardX shim: scalar-logging API the reference uses (main.py:14,
119,242-246), written to a plain text file instead of TB event files."""

import os


class SummaryWriter:
    def __init__(self, log_dir=None, **kwargs):
        self.path = os.path.join(log_dir, "scalars.txt") if log_dir else None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)

    def add_scalar(self, tag, value, step=None):
        if self.path:
            with open(self.path, "a") as f:
                f.write(f"{tag}\t{step}\t{float(value)}\n")

    def flush(self):
        pass

    def close(self):
        pass
