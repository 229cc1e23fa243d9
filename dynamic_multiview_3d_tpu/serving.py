"""Serving export: a self-contained, compiler-ready inference artifact.

The TF1 reference genre ships inference as a frozen graph — weights baked
into a serialized graph a server loads without the training code. The
TPU-native equivalent is ``jax.export``: AOT-lower the jitted predict
function to versioned StableHLO with fixed shapes, and ship it together
with the weights and config as ONE zip:

    artifact.dmv3d  (zip)
      ├── predict.stablehlo      jax.export serialization (versioned,
      │                          forward-compatible; includes the Mosaic
      │                          payloads of the Pallas kernels when
      │                          lowered for TPU)
      ├── predict_T{t}.stablehlo one extra signature per additional source
      │                          count when exported with seq_len=(...) —
      │                          the loader dispatches on image_seq.shape[1]
      ├── params.npz             flat {path: float32 ndarray}
      ├── config.json            full Config (audit/repro)
      └── manifest.json          shapes, dtypes, platforms, api version

Why params stay OUTSIDE the StableHLO: baking tens of MB of weights into
the module as constants bloats every compile and defeats donation; the
loader feeds them as ordinary arguments instead (first N inputs), which
also keeps the artifact inspectable (``np.load`` the npz).

    from dynamic_multiview_3d_tpu import serving
    serving.export_predict(model, "/path/artifact.dmv3d",
                           batch=1, seq_len=1, num_targets=8)
    served = serving.ServedModel.load("/path/artifact.dmv3d")
    views = served.predict(image_seq, target_poses)   # fixed shapes

A served model needs jax + numpy only — none of this package's model code
runs at load time (the StableHLO IS the model), mirroring the reference's
"graph + Saver checkpoint, no python model required" serving contract.
"""

from __future__ import annotations

import io
import json
import re
import zipfile

import jax
import jax.numpy as jnp
import numpy as np
from jax import export as jax_export

MANIFEST_VERSION = 1


def _custom_call_targets(exported) -> set[str]:
    """Custom-call targets embedded in an exported module.

    A truly self-contained artifact has NONE: StableHLO custom calls name
    process-local FFI handlers (LAPACK kernels, etc.) that a fresh
    "jax + numpy only" serving process may never register — executing an
    unregistered target SEGFAULTS XLA:CPU outright (round-5 find: a 3x3
    ``jnp.linalg.inv`` in the reprojection path shipped
    ``lapack_sgetrf_ffi`` into every multidepth artifact; fixed by the
    closed-form ``ops/reproject.inv3x3``). Export records the list in the
    manifest for audit; load preempts the known-dangerous ones.
    """
    txt = exported.mlir_module()
    # both textual forms: `stablehlo.custom_call @target(...)` and the
    # attribute form `custom_call_target = "target"`
    return (set(re.findall(r"stablehlo\.custom_call @([\w.]+)", txt))
            | set(re.findall(r'custom_call_target = "([^"]+)"', txt)))


def _preregister_lapack() -> None:
    """Force jaxlib's lazy LAPACK FFI registration in this process.

    jaxlib registers the lapack_* FFI handlers only when a linalg op is
    traced live (the lowering path imports jaxlib's lapack module, whose
    import registers every handler); deserialized modules skip that path,
    so their LAPACK custom calls would hit an unregistered target (a
    segfault, not an error). Lowering one tiny inverse triggers the
    import — verified to unbreak pre-fix artifacts in a fresh process.
    """
    jax.jit(jnp.linalg.inv).lower(jnp.eye(3, dtype=np.float32)).compile()


def _flatten(params, prefix=""):
    out = {}
    for k, v in params.items():
        path = f"{prefix}{k}" if not prefix else f"{prefix}/{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, path))
        else:
            out[path] = np.asarray(v)
    return out


def _unflatten(flat: dict):
    tree: dict = {}
    for path, v in flat.items():
        node = tree
        *parents, leaf = path.split("/")
        for p in parents:
            node = node.setdefault(p, {})
        node[leaf] = v
    return tree


def export_predict(model, path: str, batch: int = 1,
                   seq_len: int | tuple[int, ...] | None = None,
                   num_targets: int = 1, platforms: tuple[str, ...] = ()):
    """AOT-export ``model``'s forward at fixed shapes into ``path``.

    platforms: lowering targets, e.g. ("tpu",) or ("cpu", "tpu") — defaults
    to the current backend. Cross-platform export does NOT need the target
    hardware present (lowering only; the server compiles at load).

    seq_len may be a TUPLE of source counts: the artifact then carries one
    StableHLO module per T and ``ServedModel.predict`` dispatches on
    ``image_seq.shape[1]``. jax.export is fixed-shape by design, so
    "variable T" at serving time is a signature set, not a dynamic dim —
    this is how a ``multi_head_mode="shared"`` checkpoint (T-agnostic
    weights, BASELINE.md round 5) serves several source counts from one
    frozen artifact. Per-T-baked checkpoints fail loudly at trace time for
    any T other than the trained one. The first entry is the primary
    signature (kept at the legacy zip/manifest location, so older loaders
    still serve it and ignore the extras — no manifest version bump).
    """
    cfg = model.cfg
    if seq_len is None:
        ts: tuple[int, ...] = (cfg.data.seq_len,)
    elif isinstance(seq_len, int):
        ts = (seq_len,)
    else:
        ts = tuple(seq_len)
        if len(set(ts)) != len(ts):
            raise ValueError(f"duplicate seq_len entries: {ts}")
    s = cfg.model.image_size
    flat = _flatten(model.params)
    names = sorted(flat)

    def fn(flat_values, image_seq, src_poses, tgt_poses):
        params = _unflatten(dict(zip(names, flat_values)))
        return model.module.apply({"params": params}, image_seq, src_poses,
                                  tgt_poses)["view"]

    kw = {"platforms": list(platforms)} if platforms else {}
    param_args = tuple(jax.ShapeDtypeStruct(flat[n].shape, flat[n].dtype)
                       for n in names)
    blobs, signatures, exported_platforms = {}, {}, None
    custom_calls: set[str] = set()
    for t in ts:
        args = (
            param_args,
            jax.ShapeDtypeStruct((batch, t, s, s, 3), np.float32),
            jax.ShapeDtypeStruct((batch, t, 3), np.float32),
            jax.ShapeDtypeStruct((batch, num_targets, 3), np.float32),
        )
        exported = jax_export.export(jax.jit(fn), **kw)(*args)
        exported_platforms = list(exported.platforms)
        entry = ("predict.stablehlo" if t == ts[0]
                 else f"predict_T{t}.stablehlo")
        blobs[entry] = exported.serialize()
        custom_calls |= _custom_call_targets(exported)
        signatures[str(t)] = {
            "module": entry,
            "image_seq": [batch, t, s, s, 3],
            "src_poses": [batch, t, 3],
        }

    from dynamic_multiview_3d_tpu.api import DEFAULT_POSE
    t0 = ts[0]
    manifest = {
        "version": MANIFEST_VERSION,
        "platforms": exported_platforms,
        # legacy top-level keys describe the PRIMARY signature (ts[0]);
        # loaders that predate "signatures" serve exactly that one
        "image_seq": [batch, t0, s, s, 3],
        "src_poses": [batch, t0, 3],
        "tgt_poses": [batch, num_targets, 3],
        "view": [batch, num_targets, s, s, 3],
        "signatures": signatures,
        # audit: FFI handlers the modules require at execution time —
        # empty for a truly self-contained artifact (see _custom_call_targets)
        "custom_calls": sorted(custom_calls),
        "param_names": names,
        # default source pose rides IN the artifact so the loader never
        # imports this package's model code ("jax + numpy only")
        "default_pose": list(DEFAULT_POSE),
        # provenance the loader needs for input validation: multi-source
        # models must be fed real source poses (see ServedModel.predict),
        # and the trained source count/camera layout is audit data
        "synthesis": cfg.model.synthesis,
        "src_views": cfg.data.src_views,
        "trained_seq_len": cfg.data.seq_len,
    }
    npz = io.BytesIO()
    np.savez(npz, **flat)
    with zipfile.ZipFile(path, "w", zipfile.ZIP_STORED) as z:
        for entry, blob in blobs.items():
            z.writestr(entry, blob)
        z.writestr("params.npz", npz.getvalue())
        z.writestr("config.json", json.dumps(config_lib_to_dict(cfg)))
        z.writestr("manifest.json", json.dumps(manifest))
    return manifest


def config_lib_to_dict(cfg):
    from dynamic_multiview_3d_tpu import config as config_lib
    return config_lib.to_dict(cfg)


class ServedModel:
    """Loaded artifact: fixed-shape predict, no model code involved."""

    def __init__(self, exported_by_t, flat_params, manifest, cfg_dict):
        self._names = manifest["param_names"]
        self._params = tuple(flat_params[n] for n in self._names)
        self.manifest = manifest
        self.cfg_dict = cfg_dict
        # one jitted entry point per exported source count T; single-T
        # (and pre-"signatures") artifacts have exactly one
        self._calls = {t: jax.jit(e.call) for t, e in exported_by_t.items()}

    @property
    def seq_lens(self) -> tuple[int, ...]:
        """Source counts this artifact serves, primary first."""
        return tuple(self._calls)

    def call_for(self, seq_len: int | None = None):
        """The jitted entry point for one source count (default: primary).
        Signature: call(params_tuple, image_seq, src_poses, tgt_poses) —
        the validation-free path benchmarks time directly."""
        t = self.seq_lens[0] if seq_len is None else seq_len
        return self._calls[t]

    @classmethod
    def load(cls, path: str) -> "ServedModel":
        with zipfile.ZipFile(path) as z:
            manifest = json.loads(z.read("manifest.json"))
            cfg_dict = json.loads(z.read("config.json"))
            # pre-"signatures" artifacts carry one module at the legacy
            # entry; its T is src_poses' middle dim
            sigs = manifest.get("signatures") or {
                str(manifest["src_poses"][1]): {"module": "predict.stablehlo"}}
            exported_by_t = {
                int(t): jax_export.deserialize(z.read(sig["module"]))
                for t, sig in sigs.items()}
            with np.load(io.BytesIO(z.read("params.npz"))) as npz:
                flat = {k: npz[k] for k in npz.files}
        if manifest["version"] > MANIFEST_VERSION:
            raise ValueError(
                f"artifact version {manifest['version']} is newer than this "
                f"loader ({MANIFEST_VERSION})")
        # pre-"custom_calls" artifacts: scan the deserialized modules so the
        # lapack guard below still protects them
        targets = manifest.get("custom_calls")
        if targets is None:
            targets = sorted(set().union(*(
                _custom_call_targets(e) for e in exported_by_t.values())))
        if any(t.startswith("lapack_") for t in targets):
            _preregister_lapack()
        return cls(exported_by_t, flat, manifest, cfg_dict)

    def predict(self, image_seq, target_poses, source_poses=None,
                mesh=None):
        """Run the artifact. With ``mesh`` (a `jax.sharding.Mesh` with a
        'data' axis), the batch shards over the mesh and GSPMD partitions
        the StableHLO body — data-parallel serving without re-export; the
        exported batch must divide the mesh size."""
        m = self.manifest
        image_seq = np.asarray(image_seq, np.float32)
        target_poses = np.asarray(target_poses, np.float32)
        # dispatch on the source count: multi-signature artifacts carry one
        # fixed-shape module per exported T (see export_predict docstring)
        t_in = image_seq.shape[1] if image_seq.ndim >= 2 else None
        call = self._calls.get(t_in)
        if call is None:
            raise ValueError(
                f"image_seq has {t_in} source frames but this artifact was "
                f"exported for T in {sorted(self._calls)} (serving "
                "artifacts are fixed-shape; re-export with "
                "seq_len=(...) for other source counts)")
        exp_image_seq = list(m["image_seq"]); exp_image_seq[1] = t_in
        exp_src_poses = list(m["src_poses"]); exp_src_poses[1] = t_in
        expected = {"image_seq": exp_image_seq, "src_poses": exp_src_poses,
                    "tgt_poses": m["tgt_poses"]}
        if source_poses is None:
            # Multi-source artifacts blend every source frame by its own
            # camera — a broadcast canonical pose is out-of-distribution
            # conditioning (and wrong geometry for multidepth), so refuse
            # loudly instead of silently degrading (VERDICT r4 weak #1).
            # Pre-field artifacts have no "synthesis" key; they default to
            # the single-source behavior they were exported with.
            synthesis = m.get("synthesis", "flow")
            if synthesis in ("multiflow", "multidepth"):
                raise ValueError(
                    f"this artifact was exported from a {synthesis!r} "
                    "checkpoint: predict() requires source_poses "
                    f"(shape {m['src_poses']}, az/el/radius per source "
                    "camera); a default pose would mis-condition every "
                    "source")
            # artifacts since manifest "default_pose" carry the pose; the
            # fallback constant keeps pre-field artifacts loadable (it is
            # api.DEFAULT_POSE's value, inlined so the loader stays
            # model-code-free)
            pose = m.get("default_pose", (0.0, 0.3, 2.0))
            source_poses = np.broadcast_to(
                np.asarray(pose, np.float32), tuple(exp_src_poses))
        source_poses = np.asarray(source_poses, np.float32)
        for name, arr in (("image_seq", image_seq),
                          ("src_poses", source_poses),
                          ("tgt_poses", target_poses)):
            if list(arr.shape) != expected[name]:
                raise ValueError(
                    f"{name} shape {list(arr.shape)} != exported "
                    f"{expected[name]} (serving artifacts are fixed-shape; "
                    "re-export for other shapes)")
        if mesh is None:
            return call(self._params, image_seq, source_poses,
                        target_poses)
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P
        batched = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        params = tuple(jax.device_put(p, repl) for p in self._params)
        args = tuple(jax.device_put(a, batched)
                     for a in (image_seq, source_poses, target_poses))
        return call(params, *args)
