"""LM6d_converted-style on-disk dataset: reader, writer, and roidb.

Rebuild of the reference's dataset layer (``lib/dataset/LM6d_*.py`` +
``lib/dataset/imdb.py``), which consumes the ``LM6d_converted`` layout its
``toolkit/`` prep scripts emit.  Layout implemented here (same shape as the
reference's, with the pose file made explicit per object):

    {root}/
      models/{obj}/textured.ply                 # vertex-colored mesh
      data/observed/{scene}/{frame}-color.png   # uint8 RGB
      data/observed/{scene}/{frame}-depth.png   # uint16, meters*depth_factor
      data/observed/{scene}/{frame}-label.png   # uint8 class-id mask (0=bg)
      data/observed/{scene}/{frame}-pose_{obj}.txt  # 3x4 row-major floats
      image_set/observed/{obj}_{split}.txt      # lines: {scene}/{frame}
      init_poses/{obj}_{split}.txt              # optional external init
                                                # (PoseCNN-style), one 3x4
                                                # (12 floats) line per frame

The reference keeps a pickled "roidb" cache per imdb; records here are
plain dicts, cheap enough to rebuild each run.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np
from PIL import Image

DEPTH_FACTOR = 1000.0  # uint16 depth png = meters * 1000 (reference LM6d)


@dataclass
class FrameRecord:
    """One (frame, object) pose-refinement sample."""

    scene: str
    frame: str
    obj: str
    class_idx: int
    pose: np.ndarray  # (3, 4) GT
    init_pose: np.ndarray | None  # (3, 4) external init (PoseCNN-style)


class LM6DDataset:
    """Reader for the layout above (reference ``LM6d_refine``-family imdbs)."""

    def __init__(self, root: str, objects: list[str]):
        self.root = root
        self.objects = list(objects)
        self.class_to_idx = {o: i for i, o in enumerate(self.objects)}

    # -- paths ---------------------------------------------------------------

    #: model filenames probed in order (reference render_py loads
    #: .ply OR .obj — YCB ships textured.obj next to textured.ply).
    MODEL_CANDIDATES = ("textured.ply", "textured.obj", "model.ply",
                        "model.obj", "model.off")

    def model_path(self, obj: str) -> str:
        mdir = os.path.join(self.root, "models", obj)
        for name in self.MODEL_CANDIDATES:
            cand = os.path.join(mdir, name)
            if os.path.exists(cand):
                return cand
        # default (also the write target for dataset generators)
        return os.path.join(mdir, "textured.ply")

    @classmethod
    def discover_objects(cls, root: str) -> list[str]:
        """Object names present in a converted root (sorted ``models/``
        subdirs holding a loadable model file) — the asset-day runbook
        derives its eval config from this instead of asking the user."""
        mroot = os.path.join(root, "models")
        if not os.path.isdir(mroot):
            return []
        return sorted(
            d for d in os.listdir(mroot)
            if os.path.isdir(os.path.join(mroot, d))
            and any(os.path.exists(os.path.join(mroot, d, c))
                    for c in cls.MODEL_CANDIDATES)
        )

    def _obs(self, scene: str, frame: str, suffix: str) -> str:
        return os.path.join(self.root, "data", "observed", scene,
                            f"{frame}-{suffix}")

    def _imageset_path(self, obj: str, split: str) -> str:
        return os.path.join(self.root, "image_set", "observed",
                            f"{obj}_{split}.txt")

    def _ren(self, obj: str, scene: str, frame: str, idx: int,
             suffix: str) -> str:
        return os.path.join(self.root, "data", "rendered", obj, scene,
                            f"{frame}_{idx}-{suffix}")

    # -- loading ---------------------------------------------------------------

    def load_meshes(self, max_faces: int | None = None):
        from deepim_tpu.raster.mesh import decimate_mesh, load_mesh

        meshes = [load_mesh(self.model_path(o)) for o in self.objects]
        if max_faces:
            meshes = [decimate_mesh(m, max_faces) for m in meshes]
        return meshes

    def frame_list(self, obj: str, split: str) -> list[tuple[str, str]]:
        with open(self._imageset_path(obj, split)) as f:
            pairs = [ln.strip().split("/") for ln in f if ln.strip()]
        return [(s, fr) for s, fr in pairs]

    def gt_roidb(self, obj: str, split: str) -> list[FrameRecord]:
        """Per-frame records incl. optional external init poses."""
        records = []
        inits = self._load_init_poses(obj, split)
        for i, (scene, frame) in enumerate(self.frame_list(obj, split)):
            pose = np.loadtxt(
                self._obs(scene, frame, f"pose_{obj}.txt"), dtype=np.float32
            ).reshape(3, 4)
            records.append(
                FrameRecord(
                    scene=scene, frame=frame, obj=obj,
                    class_idx=self.class_to_idx[obj], pose=pose,
                    init_pose=None if inits is None else inits[i],
                )
            )
        return records

    def _load_init_poses(self, obj: str, split: str) -> np.ndarray | None:
        path = os.path.join(self.root, "init_poses", f"{obj}_{split}.txt")
        if not os.path.exists(path):
            return None
        arr = np.loadtxt(path, dtype=np.float32).reshape(-1, 3, 4)
        return arr

    @staticmethod
    def _read_image(path: str) -> np.ndarray:
        """PNG -> array via the native decoder (C++ inflate+unfilter), PIL
        fallback (native/src/deepim_native.cpp §dn_decode_png)."""
        from deepim_tpu import native

        if native.available():
            with open(path, "rb") as f:
                img = native.decode_png(f.read())
            if img is not None:
                return img
        return np.asarray(Image.open(path))

    def load_frame(self, rec: FrameRecord) -> dict:
        """RGB [0,1] f32, depth (m) f32, object mask bool."""
        rgb = self._read_image(
            self._obs(rec.scene, rec.frame, "color.png")
        ).astype(np.float32) / 255.0
        depth = self._read_image(
            self._obs(rec.scene, rec.frame, "depth.png")
        ).astype(np.float32) / DEPTH_FACTOR
        label_path = self._obs(rec.scene, rec.frame, "label.png")
        if os.path.exists(label_path):
            label = self._read_image(label_path)
            mask = label == (rec.class_idx + 1)
        else:
            mask = depth > 0
        return {"obs_rgb": rgb, "obs_depth": depth, "obs_mask": mask}

    def load_rendered(self, rec: FrameRecord, idx: int = 0) -> dict:
        """Pre-rendered perturbed view of ``rec``'s frame (written by
        ``toolkit.gen_rendered``) -> RGB [0,1], depth (m), src pose."""
        rgb = self._read_image(
            self._ren(rec.obj, rec.scene, rec.frame, idx, "color.png")
        ).astype(np.float32) / 255.0
        depth = self._read_image(
            self._ren(rec.obj, rec.scene, rec.frame, idx, "depth.png")
        ).astype(np.float32) / DEPTH_FACTOR
        pose = np.loadtxt(
            self._ren(rec.obj, rec.scene, rec.frame, idx, "pose.txt"),
            dtype=np.float32,
        ).reshape(3, 4)
        return {"ren_rgb": rgb, "ren_depth": depth, "pose_src": pose}

    def has_rendered(self, rec: FrameRecord, idx: int = 0) -> bool:
        return os.path.exists(
            self._ren(rec.obj, rec.scene, rec.frame, idx, "pose.txt")
        )

    # -- writing (toolkit/ prep-script parity + test fixtures) -----------------

    def write_model(self, obj: str, mesh) -> None:
        from deepim_tpu.raster.mesh import save_ply

        os.makedirs(os.path.dirname(self.model_path(obj)), exist_ok=True)
        save_ply(self.model_path(obj), mesh)

    def write_frame(self, scene: str, frame: str, rgb: np.ndarray,
                    depth: np.ndarray, label: np.ndarray | None,
                    poses: dict[str, np.ndarray]) -> None:
        """``label=None`` writes no label png (sources without masks, e.g.
        the original LINEMOD release) — readers then use depth>0."""
        d = os.path.join(self.root, "data", "observed", scene)
        os.makedirs(d, exist_ok=True)
        Image.fromarray(
            np.clip(rgb * 255, 0, 255).astype(np.uint8)
        ).save(self._obs(scene, frame, "color.png"))
        Image.fromarray(
            (depth * DEPTH_FACTOR).astype(np.uint16)
        ).save(self._obs(scene, frame, "depth.png"))
        if label is not None:
            Image.fromarray(label.astype(np.uint8)).save(
                self._obs(scene, frame, "label.png")
            )
        for obj, pose in poses.items():
            np.savetxt(self._obs(scene, frame, f"pose_{obj}.txt"),
                       np.asarray(pose, np.float32))

    def write_image_set(self, obj: str, split: str,
                        frames: list[tuple[str, str]]) -> None:
        path = self._imageset_path(obj, split)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            for scene, frame in frames:
                f.write(f"{scene}/{frame}\n")

    def write_rendered(self, obj: str, scene: str, frame: str, idx: int,
                       rgb: np.ndarray, depth: np.ndarray,
                       pose: np.ndarray) -> None:
        d = os.path.join(self.root, "data", "rendered", obj, scene)
        os.makedirs(d, exist_ok=True)
        Image.fromarray(
            np.clip(rgb * 255, 0, 255).astype(np.uint8)
        ).save(self._ren(obj, scene, frame, idx, "color.png"))
        Image.fromarray(
            (depth * DEPTH_FACTOR).astype(np.uint16)
        ).save(self._ren(obj, scene, frame, idx, "depth.png"))
        np.savetxt(self._ren(obj, scene, frame, idx, "pose.txt"),
                   np.asarray(pose, np.float32))

    def write_init_poses(self, obj: str, split: str,
                         poses: np.ndarray) -> None:
        d = os.path.join(self.root, "init_poses")
        os.makedirs(d, exist_ok=True)
        np.savetxt(os.path.join(d, f"{obj}_{split}.txt"),
                   np.asarray(poses, np.float32).reshape(-1, 12))


def load_frames_prefetched(dataset: LM6DDataset,
                           records: list[FrameRecord],
                           num_threads: int = 4) -> list[dict]:
    """Load frames with the native threaded prefetcher (IO in C++ worker
    threads, decode overlapped on the Python side); sequential fallback.

    Replaces the reference's threaded ``mx.io``-backed ``TestDataLoader``
    IO path (``deepim/core/loader.py``).
    """
    from deepim_tpu import native

    if not native.available():
        return [dataset.load_frame(r) for r in records]
    paths = []
    for r in records:
        paths += [
            dataset._obs(r.scene, r.frame, "color.png"),
            dataset._obs(r.scene, r.frame, "depth.png"),
            dataset._obs(r.scene, r.frame, "label.png"),
        ]
    datas: list[bytes | None] = [None] * len(paths)
    reader = native.PrefetchReader(paths, num_threads=num_threads)
    for idx, data in reader:
        datas[idx] = data
    reader.close()

    frames = []
    for i, r in enumerate(records):
        cd, dd, ld = datas[3 * i : 3 * i + 3]
        if cd is None or dd is None:
            frames.append(dataset.load_frame(r))  # missing file fallback
            continue
        rgb = native.decode_png(cd).astype(np.float32) / 255.0
        depth = native.decode_png(dd).astype(np.float32) / DEPTH_FACTOR
        if ld is not None:
            mask = native.decode_png(ld) == (r.class_idx + 1)
        else:
            mask = depth > 0
        frames.append({"obs_rgb": rgb, "obs_depth": depth, "obs_mask": mask})
    return frames


def prefetch_iter(it, depth: int = 1):
    """Run ``it`` on a background thread, keeping ``depth`` items ready.

    Streams eval frame batches so PNG decode overlaps device compute
    (reference ``TestDataLoader`` IO threading).  Worker exceptions are
    re-raised at the consuming ``next()`` with the real traceback chained.
    """
    import queue
    import threading

    q: queue.Queue = queue.Queue(maxsize=max(depth, 1))

    def work():
        try:
            for x in it:
                q.put(("item", x))
        except BaseException as e:  # noqa: BLE001 — re-raised below
            q.put(("error", e))
            return
        q.put(("done", None))

    threading.Thread(target=work, daemon=True).start()
    while True:
        kind, x = q.get()
        if kind == "item":
            yield x
        elif kind == "error":
            raise RuntimeError("prefetch worker failed") from x
        else:
            return


def iter_frame_batches(dataset: LM6DDataset, records: list[FrameRecord],
                       batch_size: int, pad_to: int | None = None):
    """Yield stacked frame batches (obs_rgb/obs_depth/obs_mask) of exactly
    ``batch_size`` frames, loading ONE batch of PNGs at a time.

    The streaming counterpart of :func:`make_eval_arrays` for real-dataset
    scale: a 13k-frame 480x640 test set is ~48 GB as one dense f32 array
    (more than chip HBM), so eval must stream host->device per refine
    batch.  ``pad_to`` repeats the last record to fill the final batch
    (callers drop padded rows from the results).  Wrap in
    :func:`prefetch_iter` to overlap decode with device compute.
    """
    n = pad_to or len(records)
    assert n % batch_size == 0, "pad_to must be a batch multiple"
    recs = records + [records[-1]] * (n - len(records))
    for i in range(0, n, batch_size):
        frames = load_frames_prefetched(dataset, recs[i : i + batch_size])
        yield {
            "obs_rgb": np.stack([f["obs_rgb"] for f in frames]),
            "obs_depth": np.stack([f["obs_depth"] for f in frames]),
            "obs_mask": np.stack([f["obs_mask"] for f in frames]),
        }


def make_eval_arrays(dataset: LM6DDataset, records: list[FrameRecord],
                     pad_to: int | None = None) -> dict[str, np.ndarray]:
    """Stack a record list into dense arrays for batched refinement.

    ``pad_to`` repeats the last record so the batch fills a static shape
    (padded entries are sliced off the results by the caller).
    """
    n = len(records)
    total = pad_to or n
    recs = records + [records[-1]] * (total - n)
    frames = load_frames_prefetched(dataset, recs)
    return {
        "obs_rgb": np.stack([f["obs_rgb"] for f in frames]),
        "obs_depth": np.stack([f["obs_depth"] for f in frames]),
        "obs_mask": np.stack([f["obs_mask"] for f in frames]),
        "pose_gt": np.stack([r.pose for r in recs]),
        "init_pose": np.stack(
            [r.init_pose if r.init_pose is not None else r.pose for r in recs]
        ),
        "class_idx": np.asarray([r.class_idx for r in recs], np.int32),
        "num_real": n,
    }


def apply_bop_init(records: list[FrameRecord], init: np.ndarray,
                   csv_path: str,
                   obj_ids: list[int] | None = None) -> int:
    """Overwrite ``init[i]`` with external init poses from a BOP results
    CSV, matched by (scene_id, im_id, obj_id).

    The reference imports PoseCNN's released results as test-time init
    poses; in the modern ecosystem those circulate as BOP results CSVs
    (``eval/bop_results.py``).  ``obj_ids`` maps ``class_idx`` (the
    per-config object-list index) to the dataset's real 1-based BOP
    object id (``dataset.obj_ids`` cfg); without it the positional
    default ``class_idx + 1`` only matches CSVs this repo wrote itself —
    real LINEMOD ids run 1..15 with gaps, so a per-class config's single
    object would silently match the wrong id.  Scene/frame names must
    parse as integers (the LM6d layout uses zero-padded numerals).
    Mutates ``init`` in place for the first ``len(records)`` rows;
    returns the match count.
    """
    from deepim_tpu.eval.bop_results import read_bop_csv

    if obj_ids is not None:
        n_cls = max((r.class_idx for r in records), default=-1) + 1
        if len(obj_ids) < n_cls:
            raise ValueError(
                f"dataset.obj_ids has {len(obj_ids)} entries but records "
                f"reference {n_cls} classes — the id map must cover every "
                "object in dataset.objects")
    bop = read_bop_csv(csv_path)
    # BOP permits several scored estimates per (scene, im, obj) target
    # (multi-hypothesis methods); keep the highest-scored one.
    best: dict = {}  # key -> (score, pose)
    for s, im, o, sc, p in zip(bop["scene_ids"], bop["im_ids"],
                               bop["obj_ids"], bop["scores"], bop["poses"]):
        key = (int(s), int(im), int(o))
        if key not in best or sc > best[key][0]:
            best[key] = (sc, p)
    matched = 0
    for i, rec in enumerate(records):
        oid = (obj_ids[rec.class_idx] if obj_ids
               else rec.class_idx + 1)
        try:
            key = (int(rec.scene), int(rec.frame), int(oid))
        except ValueError:
            continue
        hit = best.get(key)
        if hit is not None:
            init[i] = hit[1]
            matched += 1
    return matched


class TrainBatcher:
    """Shuffled-epoch minibatch iterator over on-disk LM6d frames.

    The on-disk half of the reference's ``TrainDataLoader``
    (``deepim/core/loader.py``): shuffles the merged per-object roidb every
    epoch and yields dense numpy batches; frame IO runs one batch AHEAD on
    a background thread (atop the native C++ prefetch reader), so the
    accelerator never waits on PNG decode.

    Yields dicts with obs_rgb/obs_depth/obs_mask/pose_tgt/class_idx — the
    caller adds pose_src (perturbed GT) and K.
    """

    def __init__(self, dataset: LM6DDataset, objects: list[str],
                 batch_size: int, split: str = "train", seed: int = 0,
                 num_shards: int = 1, shard_index: int = 0):
        """``num_shards``/``shard_index`` shard the roidb across processes
        for multi-host training (pass ``jax.process_count()`` /
        ``jax.process_index()``; ``batch_size`` is then the PER-PROCESS
        slice — ``parallel.process_local_batch_size(global_batch)``)."""
        import threading

        self.dataset = dataset
        self.batch_size = batch_size
        self.records = [
            r for obj in objects for r in dataset.gt_roidb(obj, split)
        ]
        if num_shards > 1:
            self.records = self.records[shard_index::num_shards]
        if not self.records:
            raise ValueError(f"no '{split}' records under {dataset.root}"
                             + (f" for shard {shard_index}/{num_shards}"
                                if num_shards > 1 else ""))
        self._rng = np.random.RandomState(seed)
        self._order: list[int] = []
        self._threading = threading
        self._thread = None
        self._pending = None
        self._start_next()

    @property
    def num_records(self) -> int:
        return len(self.records)

    def _take(self) -> list[FrameRecord]:
        out = []
        while len(out) < self.batch_size:
            if not self._order:
                self._order = list(self._rng.permutation(len(self.records)))
            out.append(self.records[self._order.pop()])
        return out

    def _load(self, recs: list[FrameRecord]) -> dict[str, np.ndarray]:
        frames = load_frames_prefetched(self.dataset, recs)
        return {
            "obs_rgb": np.stack([f["obs_rgb"] for f in frames]),
            "obs_depth": np.stack([f["obs_depth"] for f in frames]),
            "obs_mask": np.stack(
                [f["obs_mask"] for f in frames]
            ).astype(np.float32),
            "pose_tgt": np.stack([r.pose for r in recs]),
            "class_idx": np.asarray([r.class_idx for r in recs], np.int32),
        }

    def _start_next(self):
        recs = self._take()
        box = {}

        def work():
            # Exceptions must cross the thread boundary intact: a corrupt
            # PNG or missing file mid-epoch would otherwise surface as an
            # opaque KeyError('batch') with the real traceback lost.
            try:
                box["batch"] = self._load(recs)
            except BaseException as e:  # noqa: BLE001 — re-raised in next()
                box["error"] = e

        self._pending = box
        self._thread = self._threading.Thread(target=work, daemon=True)
        self._thread.start()

    def next(self) -> dict[str, np.ndarray]:
        self._thread.join()
        if "error" in self._pending:
            err = self._pending["error"]
            self._start_next()  # keep the iterator usable past a bad batch
            raise RuntimeError(
                "TrainBatcher prefetch worker failed while loading a batch"
            ) from err
        batch = self._pending["batch"]
        self._start_next()
        return batch
