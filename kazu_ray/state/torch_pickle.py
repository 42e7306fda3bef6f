"""Load PyTorch zip checkpoints into numpy arrays without torch.

A ``pytorch_model.bin`` (zipfile serialization, the format every HF
checkpoint ships) is a zip archive holding ``<root>/data.pkl`` — a
pickle of the state dict whose tensors are *persistent references* to
raw little-endian storage files ``<root>/data/<key>``.  The pickle
stream only needs two torch symbols, both with stable public
signatures: ``torch._utils._rebuild_tensor_v2`` and the per-dtype
storage classes.  This module supplies numpy-backed stand-ins via a
custom Unpickler, so model weights load in this torch-less container.

Supports the subset real encoder checkpoints use: contiguous or strided
float/int tensors rebuilt from flat storages.  No code is executed from
the archive beyond these two whitelisted symbols — everything else is
rejected (safer than a stock ``pickle.load``).
"""

from __future__ import annotations

import pickle
import zipfile
from collections import OrderedDict

import numpy as np

_DTYPES = {
    "FloatStorage": np.float32,
    "DoubleStorage": np.float64,
    "HalfStorage": np.float16,
    "LongStorage": np.int64,
    "IntStorage": np.int32,
    "ShortStorage": np.int16,
    "CharStorage": np.int8,
    "ByteStorage": np.uint8,
    "BoolStorage": np.bool_,
}


class _StorageRef:
    def __init__(self, dtype: np.dtype, data: bytes):
        self.array = np.frombuffer(data, dtype=dtype)


def _rebuild_tensor_v2(storage, storage_offset, size, stride, *_args):
    flat = storage.array
    if not size:
        return flat[storage_offset].copy()
    if stride and len(stride) > 1 or (stride and stride[0] != 1):
        return np.lib.stride_tricks.as_strided(
            flat[storage_offset:],
            shape=tuple(size),
            strides=tuple(s * flat.itemsize for s in stride),
        ).copy()
    n = int(np.prod(size))
    return flat[storage_offset : storage_offset + n].reshape(tuple(size)).copy()


class _TorchUnpickler(pickle.Unpickler):
    def __init__(self, file, zf: zipfile.ZipFile, root: str):
        super().__init__(file)
        self._zf = zf
        self._root = root

    def find_class(self, module: str, name: str):
        if module == "torch._utils" and name in ("_rebuild_tensor_v2", "_rebuild_tensor"):
            return _rebuild_tensor_v2
        if module == "torch" and name in _DTYPES:
            return _DTYPES[name]
        if module == "collections" and name == "OrderedDict":
            return OrderedDict
        raise pickle.UnpicklingError(f"refusing to load {module}.{name}")

    def persistent_load(self, pid):
        kind, storage_type, key, _location, _numel = pid
        if kind != "storage":
            raise pickle.UnpicklingError(f"unknown persistent id {kind}")
        dtype = storage_type if isinstance(storage_type, type) else _DTYPES[storage_type]
        data = self._zf.read(f"{self._root}/data/{key}")
        return _StorageRef(np.dtype(dtype), data)


def load_state_dict(path: str) -> dict[str, np.ndarray]:
    """Read a pytorch zip checkpoint into {param_name: ndarray}."""
    with zipfile.ZipFile(path) as zf:
        pkl_names = [n for n in zf.namelist() if n.endswith("/data.pkl")]
        if not pkl_names:
            raise ValueError(f"{path}: not a pytorch zip checkpoint")
        root = pkl_names[0].rsplit("/", 1)[0]
        with zf.open(pkl_names[0]) as f:
            state = _TorchUnpickler(f, zf, root).load()
    return dict(state)


# ---------------------------------------------------------------------------
# torch-less WRITER for the same zip format — used to produce the repo's
# tiny checked-in token-classification checkpoint.  The output is a
# standard ``pytorch_model.bin``: real ``torch.load`` reads it on a
# cluster, and :func:`load_state_dict` reads it here.
# ---------------------------------------------------------------------------


def _stub_modules():
    """Fake ``torch``/``torch._utils`` modules so stock pickle emits the
    canonical GLOBAL references without torch installed.  No-op when a
    real torch is importable (its own symbols already satisfy pickle)."""
    import sys
    import types

    if "torch" in sys.modules:
        return
    t = types.ModuleType("torch")
    tu = types.ModuleType("torch._utils")

    def _rebuild(*args):  # never called at save time
        raise RuntimeError("stub")

    _rebuild.__module__ = "torch._utils"
    _rebuild.__qualname__ = "_rebuild_tensor_v2"
    _rebuild.__name__ = "_rebuild_tensor_v2"
    tu._rebuild_tensor_v2 = _rebuild
    storage = type("FloatStorage", (), {"__module__": "torch"})
    t.FloatStorage = storage
    t._utils = tu
    sys.modules["torch"] = t
    sys.modules["torch._utils"] = tu


class _StorageToSave:
    def __init__(self, key: str, numel: int):
        self.key = key
        self.numel = numel


class _TensorToSave:
    def __init__(self, storage: _StorageToSave, shape: tuple[int, ...]):
        self.storage = storage
        self.shape = shape

    def __reduce__(self):
        import sys

        rebuild = sys.modules["torch._utils"]._rebuild_tensor_v2
        stride = []
        acc = 1
        for dim in reversed(self.shape):
            stride.append(acc)
            acc *= dim
        stride.reverse()
        return (
            rebuild,
            (self.storage, 0, tuple(self.shape), tuple(stride), False, OrderedDict()),
        )


class _SavePickler(pickle.Pickler):
    def persistent_id(self, obj):
        if isinstance(obj, _StorageToSave):
            import sys

            return ("storage", sys.modules["torch"].FloatStorage, obj.key, "cpu", obj.numel)
        return None


def save_state_dict(state: dict[str, np.ndarray], path: str) -> None:
    """Write {param_name: float ndarray} as a pytorch zip checkpoint."""
    import io

    _stub_modules()
    arrays = {k: np.ascontiguousarray(v, dtype=np.float32) for k, v in state.items()}
    od = OrderedDict(
        (k, _TensorToSave(_StorageToSave(str(i), a.size), a.shape))
        for i, (k, a) in enumerate(arrays.items())
    )
    buf = io.BytesIO()
    _SavePickler(buf, protocol=2).dump(od)
    with zipfile.ZipFile(path, "w", compression=zipfile.ZIP_STORED) as zf:
        zf.writestr("archive/data.pkl", buf.getvalue())
        zf.writestr("archive/version", "3\n")
        for i, a in enumerate(arrays.values()):
            zf.writestr(f"archive/data/{i}", a.tobytes())
