"""S12 — resource-log sink: CSV append of RSS/HWM (+ gc counts) per
epoch / per N batches, with an fsync'd header.

Reference: app/main.py:81-88 _ensure_csv_header (fsync so a later OOM
kill cannot lose the header) and predictor_plugins/common/callbacks.py
:140-245 ResourceUsageLogger / BatchResourceUsageLogger ("designed for
long GA runs where the kernel OOM killer provides no Python traceback" —
the last written row localizes the death). Column layout is kept
verbatim; the GPU columns stay empty here (no GPU runtime in the engine's
numpy cores), exactly like the reference on a CPU-only host.

Deployment note: the engine trains inside applyInPandas on executors, so
a logger constructed inside the training closure writes to
EXECUTOR-local disk — the same per-worker CSV layout the reference's
candidate workers produce. file_path should therefore include a
worker-unique component (the estimator passes the series key) when used
distributed; driver-side use (GA orchestration loops) needs nothing
special.
"""

from __future__ import annotations

import gc
import os
import time
from dataclasses import dataclass

_EPOCH_HEADER = "ts,epoch,tag,VmRSS_kB,VmHWM_kB,gpu_current_B,gpu_peak_B,gc0,gc1,gc2"
_BATCH_HEADER = "ts,epoch,batch,tag,VmRSS_kB,VmHWM_kB,gpu_current_B,gpu_peak_B,gc0,gc1,gc2"


def ensure_csv_header(path: str, header_line: str) -> None:
    """main.py:81-88 — write the header iff the file is absent/empty,
    flushed AND fsync'd so it survives an immediate OOM kill."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if not os.path.exists(path) or os.path.getsize(path) == 0:
        with open(path, "w", encoding="utf-8") as f:
            f.write(header_line.rstrip("\n") + "\n")
            f.flush()
            os.fsync(f.fileno())


@dataclass
class ResourceSnapshot:
    ts: float
    rss_kb: int | None
    hwm_kb: int | None
    gc_counts: tuple[int, int, int] | None


def capture_resource_snapshot(include_gc: bool = False) -> ResourceSnapshot:
    """VmRSS/VmHWM from /proc/self/status (Linux; None elsewhere) +
    optional gc generation counts — callbacks.py capture path without the
    psutil/GPU dependencies."""
    rss = hwm = None
    try:
        with open("/proc/self/status", encoding="ascii") as f:
            for line in f:
                if line.startswith("VmRSS:"):
                    rss = int(line.split()[1])
                elif line.startswith("VmHWM:"):
                    hwm = int(line.split()[1])
    except OSError:
        pass
    counts = tuple(gc.get_count()) if include_gc else None
    return ResourceSnapshot(time.time(), rss, hwm, counts)


def _fmt(v) -> str:
    return "" if v is None else str(v)


class ResourceUsageLogger:
    """callbacks.py:140-183 — append one row per epoch. Use as the
    ``on_epoch_end`` hook of the model cores' train loops."""

    def __init__(self, file_path: str, *, tag: str | None = None,
                 flush_every: int = 1, include_gc: bool = False):
        self.file_path = file_path
        self.tag = tag or ""
        self.flush_every = max(1, int(flush_every))
        self.include_gc = bool(include_gc)
        self._epoch_count = 0
        ensure_csv_header(file_path, _EPOCH_HEADER)

    def on_epoch_end(self, epoch: int, logs=None) -> None:
        self._epoch_count += 1
        s = capture_resource_snapshot(include_gc=self.include_gc)
        gc0, gc1, gc2 = s.gc_counts if s.gc_counts is not None else ("", "", "")
        with open(self.file_path, "a", encoding="utf-8") as f:
            f.write(f"{s.ts:.3f},{epoch},{self.tag},"
                    f"{_fmt(s.rss_kb)},{_fmt(s.hwm_kb)},,,"
                    f"{gc0},{gc1},{gc2}\n")
            if (self._epoch_count % self.flush_every) == 0:
                f.flush()

    # callable alias so it can be handed directly to train(on_epoch_end=...)
    __call__ = on_epoch_end


class BatchResourceUsageLogger:
    """callbacks.py:187-245 — append a row every N batches; tracks the
    current epoch via on_epoch_begin like the Keras callback."""

    def __init__(self, file_path: str, *, tag: str | None = None,
                 every_n_batches: int = 50, flush_every: int = 1,
                 include_gc: bool = False):
        self.file_path = file_path
        self.tag = tag or ""
        self.every_n_batches = max(1, int(every_n_batches))
        self.flush_every = max(1, int(flush_every))
        self.include_gc = bool(include_gc)
        self._row_count = 0
        self._current_epoch: int | str = ""
        ensure_csv_header(file_path, _BATCH_HEADER)

    def on_epoch_begin(self, epoch: int, logs=None) -> None:
        self._current_epoch = int(epoch)

    def on_train_batch_end(self, batch: int, logs=None) -> None:
        if ((int(batch) + 1) % self.every_n_batches) != 0:
            return
        self._row_count += 1
        s = capture_resource_snapshot(include_gc=self.include_gc)
        gc0, gc1, gc2 = s.gc_counts if s.gc_counts is not None else ("", "", "")
        with open(self.file_path, "a", encoding="utf-8") as f:
            f.write(f"{s.ts:.3f},{self._current_epoch},{int(batch)},{self.tag},"
                    f"{_fmt(s.rss_kb)},{_fmt(s.hwm_kb)},,,"
                    f"{gc0},{gc1},{gc2}\n")
            if (self._row_count % self.flush_every) == 0:
                f.flush()
