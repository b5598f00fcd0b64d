"""TensorBoard scalar logging (parity: tensorboardX SummaryWriter usage in
tools/train.py:117,203, train_stamp.py:137, loss .logging() methods).

Thin wrapper that degrades to a no-op when tensorboardX is unavailable, so
training CLIs never hard-depend on it.
"""

from typing import Mapping, Optional


class ScalarWriter:
    def __init__(self, log_dir: Optional[str]):
        self._w = None
        if log_dir is None:
            return
        try:
            from tensorboardX import SummaryWriter
            self._w = SummaryWriter(log_dir)
        except Exception:
            self._w = None

    def scalars(self, tag_values: Mapping[str, float], step: int,
                prefix: str = ""):
        if self._w is None:
            return
        for k, v in tag_values.items():
            try:
                self._w.add_scalar(prefix + k, float(v), step)
            except (TypeError, ValueError):
                pass

    def close(self):
        if self._w is not None:
            self._w.close()
