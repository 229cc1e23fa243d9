"""TFRecord ingestion (SURVEY.md R1: the reference "globs frame files or
tfrecords"; this is the tfrecords half — `data.source="tfrecords"`).

On-disk contract: ``cfg.root`` holds one or more ``*.tfrecord`` shard
files. Each record is a serialized ``tf.train.Example`` describing ONE
frame:

    scene          bytes   scene id (records of one scene may span shards)
    view           int64   camera index v in [0, V)
    t              int64   timestep in [0, T)
    image/encoded  bytes   PNG-encoded RGB(A) frame
    pose           floats  (az, el, radius) look-at pose of camera v
    num_views      int64   V for the scene
    seq_len        int64   T for the scene
    dynamic        int64   0/1

Design notes (TPU-first data plumbing, not a tf.data port):

- Random access, not streaming. ``tf.data.TFRecordDataset`` is sequential;
  this trainer's samplers (`sample_indices`, HBM-resident gathers) want
  O(1) access by (scene, view, t). The reader walks each shard's record
  FRAMING once at init (length-prefixed: u64le length, masked-crc32c of
  the length, payload, masked-crc32c of the payload) recording
  (shard, offset, size) per frame — ~24 bytes of index per record — then
  mmaps shards and proto-parses only the records a batch actually touches.
- The framing walk is pure numpy/struct; the proto codec comes from
  ``tensorflow.core.example.example_pb2`` (tensorflow is only imported by
  this module, never by the rest of the package).
- ``export_tfrecords`` writes the same format with a pure-python masked
  crc32c (Castagnoli), byte-compatible with TFRecordDataset/TFRecordWriter
  — round-trip against tf.io is covered in tests/test_tfrecords.py.

Sampling/batching inherit from FrameFolderScenes, so the Grain pipeline,
orbit sources and the train loop are layout-agnostic (same pattern as
data/shapenet.py).
"""

from __future__ import annotations

import glob
import os
import struct

import numpy as np

from dynamic_multiview_3d_tpu.config import DataConfig
from dynamic_multiview_3d_tpu.data.frames import FrameFolderScenes

# --- masked crc32c (Castagnoli), as TFRecord framing requires ------------

_CRC_TABLE = None


def _crc32c_table() -> np.ndarray:
    global _CRC_TABLE
    if _CRC_TABLE is None:
        poly = 0x82F63B78                      # reflected Castagnoli
        table = np.empty(256, np.uint32)
        for i in range(256):
            c = i
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            table[i] = c
        _CRC_TABLE = table
    return _CRC_TABLE


try:                                           # C implementation when present
    from google_crc32c import value as _crc32c_fast
except Exception:                              # pragma: no cover
    _crc32c_fast = None


def _crc32c(data: bytes) -> int:
    if _crc32c_fast is not None:
        return _crc32c_fast(bytes(data))
    table = _crc32c_table()
    crc = np.uint32(0xFFFFFFFF)
    for b in np.frombuffer(data, np.uint8):
        crc = table[(crc ^ b) & np.uint32(0xFF)] ^ (crc >> np.uint8(8))
    return int(crc ^ np.uint32(0xFFFFFFFF))


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return ((crc >> 15 | crc << 17) + 0xA282EAD8) & 0xFFFFFFFF


def _example_pb2():
    try:
        from tensorflow.core.example import example_pb2
    except Exception as e:                      # pragma: no cover
        raise ImportError(
            "data.source='tfrecords' needs the tf.train.Example proto "
            "codec (tensorflow.core.example) on this host") from e
    return example_pb2


# --- framing -------------------------------------------------------------

def iter_record_spans(path: str, verify_crc: bool = False):
    """Yield (offset, length) of each record payload in a TFRecord shard.

    Default: framing only — no CRC verification (framing corruption
    surfaces as a proto parse error at access time) and no payload copies:
    one pass over the 12-byte headers. A bit-flip INSIDE a payload parses
    fine though, silently feeding garbage pixels — ``verify_crc=True``
    (``data.verify_crc``) checks both masked CRCs per record during the
    index pass and raises with the shard/offset on the first mismatch.
    """
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        pos = 0
        while pos + 12 <= size:
            header = f.read(12)
            (length,) = struct.unpack("<Q", header[:8])
            payload_at = pos + 12
            if payload_at + length + 4 > size:
                raise ValueError(f"truncated tfrecord shard: {path}")
            if verify_crc:
                (len_crc,) = struct.unpack("<I", header[8:12])
                if len_crc != _masked_crc(header[:8]):
                    raise ValueError(
                        f"tfrecord length-CRC mismatch at {path}:{pos}")
                payload = f.read(length)
                (pay_crc,) = struct.unpack("<I", f.read(4))
                if pay_crc != _masked_crc(payload):
                    raise ValueError(
                        f"tfrecord payload-CRC mismatch at "
                        f"{path}:{payload_at} (length {length})")
            yield payload_at, length
            pos = payload_at + length + 4
            f.seek(pos)


def write_records(path: str, payloads) -> None:
    """Write serialized payloads in TFRecord framing (tf.io-compatible)."""
    with open(path, "wb") as f:
        for data in payloads:
            header = struct.pack("<Q", len(data))
            f.write(header)
            f.write(struct.pack("<I", _masked_crc(header)))
            f.write(data)
            f.write(struct.pack("<I", _masked_crc(data)))


class TFRecordScenes(FrameFolderScenes):
    """Random-access examples over TFRecord shards (``data.root`` glob)."""

    def __init__(self, cfg: DataConfig):
        if not cfg.root:
            raise FileNotFoundError("tfrecords source needs data.root")
        pattern = cfg.root if any(ch in cfg.root for ch in "*?[") else \
            os.path.join(cfg.root, "*.tfrecord*")
        self.shards = sorted(glob.glob(pattern))
        if not self.shards:
            raise FileNotFoundError(f"no tfrecord shards match {pattern!r}")
        self.cfg = cfg
        pb = _example_pb2()
        # index pass: (scene, view, t) -> (shard, offset, size) + poses
        scenes: dict[str, dict] = {}
        for si, shard in enumerate(self.shards):
            with open(shard, "rb") as f:
                data = f.read()
            for off, length in iter_record_spans(
                    shard, verify_crc=cfg.verify_crc):
                ex = pb.Example.FromString(data[off:off + length])
                feat = ex.features.feature
                name = feat["scene"].bytes_list.value[0].decode()
                v = int(feat["view"].int64_list.value[0])
                t = int(feat["t"].int64_list.value[0])
                rec = scenes.setdefault(name, {
                    "num_views": int(feat["num_views"].int64_list.value[0]),
                    "seq_len": int(feat["seq_len"].int64_list.value[0]),
                    "dynamic": bool(feat["dynamic"].int64_list.value[0]),
                    "packed": False,
                    "_spans": {},
                    "_poses": {},
                })
                rec["_spans"][(v, t)] = (si, off, length)
                rec["_poses"][v] = np.asarray(
                    feat["pose"].float_list.value, np.float32)
        for name, rec in scenes.items():
            vv, tt = rec["num_views"], rec["seq_len"]
            missing = [(v, t) for v in range(vv) for t in range(tt)
                       if (v, t) not in rec["_spans"]]
            if missing:
                raise ValueError(
                    f"tfrecord scene {name!r} is missing frames "
                    f"{missing[:4]}{'...' if len(missing) > 4 else ''}")
            rec["poses"] = np.stack(
                [rec["_poses"][v] for v in range(vv)]).astype(np.float32)
        self.scenes = sorted(scenes)
        self._meta_cache = {name: scenes[name] for name in self.scenes}
        self._pack_cache: dict[str, np.ndarray] = {}
        self._mmaps: list[np.ndarray] = [
            np.memmap(s, np.uint8, "r") for s in self.shards]
        self._pb = pb

    def _meta(self, scene: str) -> dict:
        return self._meta_cache[scene]

    def _read_frame(self, scene: str, view: int, t: int) -> np.ndarray:
        import imageio.v2 as imageio
        si, off, length = self._meta_cache[scene]["_spans"][(view, t)]
        ex = self._pb.Example.FromString(
            self._mmaps[si][off:off + length].tobytes())
        png = ex.features.feature["image/encoded"].bytes_list.value[0]
        img = np.asarray(imageio.imread(png))
        if img.ndim == 2:
            img = np.repeat(img[..., None], 3, axis=-1)
        return img[..., :3]


def export_tfrecords(root: str, num_scenes: int = 4, image_size: int = 64,
                     num_views: int = 8, seq_len: int = 1,
                     dynamic: bool = False, seed: int = 0,
                     shards: int = 2, scene_offset: int = 0) -> str:
    """Materialize procedural scenes as TFRecord shards (fixture/export).

    Frames are distributed round-robin over ``shards`` files so scenes
    genuinely span shards (the reader must reassemble them).
    """
    import io

    import imageio.v2 as imageio

    from dynamic_multiview_3d_tpu.data.synthetic import SyntheticScenes

    pb = _example_pb2()
    src = SyntheticScenes(num_scenes=num_scenes + scene_offset,
                          image_size=image_size, seq_len=seq_len,
                          dynamic=dynamic, seed=seed)
    rng = np.random.default_rng(seed + 11)
    os.makedirs(root, exist_ok=True)
    payloads: list[list[bytes]] = [[] for _ in range(shards)]
    n = 0
    for i in range(scene_offset, scene_offset + num_scenes):
        poses = src.sample_poses(rng, num_views)
        for v in range(num_views):
            for t in range(seq_len):
                img = src.render(i, poses[v],
                                 time=t / max(seq_len - 1, 1))
                buf = io.BytesIO()
                imageio.imwrite(buf, img, format="png")
                ex = pb.Example()
                feat = ex.features.feature
                feat["scene"].bytes_list.value.append(
                    f"scene_{i:05d}".encode())
                feat["view"].int64_list.value.append(v)
                feat["t"].int64_list.value.append(t)
                feat["image/encoded"].bytes_list.value.append(
                    buf.getvalue())
                feat["pose"].float_list.value.extend(
                    np.asarray(poses[v], np.float32))
                feat["num_views"].int64_list.value.append(num_views)
                feat["seq_len"].int64_list.value.append(seq_len)
                feat["dynamic"].int64_list.value.append(int(dynamic))
                payloads[n % shards].append(ex.SerializeToString())
                n += 1
    for s in range(shards):
        write_records(
            os.path.join(root, f"frames-{s:05d}-of-{shards:05d}.tfrecord"),
            payloads[s])
    return root
