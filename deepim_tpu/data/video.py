"""Video pose-tracking datasets (the YCB-Video role in the reference).

Rebuild of the reference's YCB-Video handling (``lib/dataset/ycb_video*``:
21-object video sequences, keyframe test lists, PoseCNN init poses, AUC
evaluation).  Layout (extends the LM6d observed layout with ordered
sequences and per-frame multi-object poses):

    {root}/models/{obj}/textured.ply
    {root}/data/video/{seq}/{frame}-color.png / -depth.png / -label.png
    {root}/data/video/{seq}/{frame}-pose_{obj}.txt
    {root}/video_sets/{seq}.txt          # ordered frame ids, one per line
    {root}/video_sets/{seq}_objects.txt  # object names present in the seq
    {root}/init_poses/video_{seq}.txt    # (M, 3, 4) frame-0 inits

Tracking evaluation: :func:`deepim_tpu.refine.video.refine_video`
propagates poses frame-to-frame; AUC ADD(-S) per the YCB protocol comes
from :func:`deepim_tpu.eval.evaluator.evaluate_poses`.
"""

from __future__ import annotations

import os

import numpy as np

from deepim_tpu.data.lm6d import DEPTH_FACTOR, LM6DDataset


class VideoDataset:
    """Reader/writer for the sequence layout above."""

    def __init__(self, root: str, objects: list[str]):
        self.root = root
        self.objects = list(objects)
        self.class_to_idx = {o: i for i, o in enumerate(self.objects)}
        # reuse the LM6d machinery for models + per-frame files
        self._frames = LM6DDataset(root, objects)

    def _vid(self, seq: str, frame: str, suffix: str) -> str:
        return os.path.join(self.root, "data", "video", seq,
                            f"{frame}-{suffix}")

    def sequences(self) -> list[str]:
        d = os.path.join(self.root, "video_sets")
        # keyframe.txt is the eval frame list, not a sequence (cli.track
        # iterates sequences(); treating it as one crashes the tracker)
        return sorted(
            f[:-4] for f in os.listdir(d)
            if f.endswith(".txt") and not f.endswith("_objects.txt")
            and f != "keyframe.txt"
        )

    def frame_ids(self, seq: str) -> list[str]:
        with open(os.path.join(self.root, "video_sets", f"{seq}.txt")) as f:
            return [ln.strip() for ln in f if ln.strip()]

    def objects_in(self, seq: str) -> list[str]:
        path = os.path.join(self.root, "video_sets", f"{seq}_objects.txt")
        with open(path) as f:
            return [ln.strip() for ln in f if ln.strip()]

    def init_poses(self, seq: str) -> np.ndarray | None:
        path = os.path.join(self.root, "init_poses", f"video_{seq}.txt")
        if not os.path.exists(path):
            return None
        return np.loadtxt(path, dtype=np.float32).reshape(-1, 3, 4)

    def load_sequence(self, seq: str, with_depths: bool = True,
                      with_labels: bool = True, start: int = 0,
                      count: int | None = None) -> dict:
        """-> frames (T, H, W, 3) f32, depths (T, H, W) metric (or None),
        poses (T, M, 3, 4), class_idx (M,).

        ``with_depths``/``with_labels`` skip decoding those streams (the
        caller doesn't need them — e.g. tracking with a model that takes
        neither depth nor mask inputs); a skipped stream loads as None.
        ``start``/``count`` load a frame WINDOW — real sequences run to
        thousands of frames (a whole YCB video is tens of GB as f32), so
        tracking streams windows instead of materializing the sequence.
        """
        objs = self.objects_in(seq)
        fids = self.frame_ids(seq)
        if count is not None:
            fids = fids[start : start + count]
        elif start:
            fids = fids[start:]
        frames, depths, labels, poses = [], [], [], []
        for fid in fids:
            rgb = LM6DDataset._read_image(
                self._vid(seq, fid, "color.png")
            ).astype(np.float32) / 255.0
            frames.append(rgb)
            dpath = self._vid(seq, fid, "depth.png")
            if with_depths and os.path.exists(dpath):
                depths.append(LM6DDataset._read_image(dpath)
                              .astype(np.float32) / DEPTH_FACTOR)
            lpath = self._vid(seq, fid, "label.png")
            if with_labels and os.path.exists(lpath):
                labels.append(LM6DDataset._read_image(lpath))
            per_obj = [
                np.loadtxt(self._vid(seq, fid, f"pose_{o}.txt"),
                           dtype=np.float32).reshape(3, 4)
                for o in objs
            ]
            poses.append(np.stack(per_obj))
        return {
            "frames": np.stack(frames),
            "depths": (np.stack(depths) if len(depths) == len(fids)
                       else None),
            # label convention: pixel value = 1 + position in this
            # sequence's object list (0 = background), the per-sequence
            # analog of LM6d's class_idx+1 labels
            "labels": (np.stack(labels) if len(labels) == len(fids)
                       else None),
            "poses": np.stack(poses),
            "class_idx": np.asarray(
                [self.class_to_idx[o] for o in objs], np.int32
            ),
            "objects": objs,
        }

    # -- keyframe protocol (the YCB-Video evaluation convention) ----------

    def keyframes(self) -> list[tuple[str, str]]:
        """The released-style keyframe test list: ``video_sets/keyframe.txt``
        lines ``{seq}/{frame}`` (YCB-Video evaluates on these frames only,
        batched per keyframe — NOT by tracking)."""
        path = os.path.join(self.root, "video_sets", "keyframe.txt")
        with open(path) as f:
            return [tuple(ln.strip().split("/"))
                    for ln in f if ln.strip()]

    def has_keyframes(self) -> bool:
        return os.path.exists(
            os.path.join(self.root, "video_sets", "keyframe.txt"))

    def write_keyframes(self, pairs: list[tuple[str, str]]) -> None:
        os.makedirs(os.path.join(self.root, "video_sets"), exist_ok=True)
        with open(os.path.join(self.root, "video_sets", "keyframe.txt"),
                  "w") as f:
            for seq, fid in pairs:
                f.write(f"{seq}/{fid}\n")

    def load_frame_raw(self, seq: str, frame: str) -> dict:
        """Decode one frame's shared images (RGB [0,1], metric depth, raw
        label or None) ONCE.  Real YCB keyframes average ~4-5 objects per
        scene; per-object masks are cut from the shared label by
        :meth:`frame_mask` / ``iter_keyframe_batches`` so the PNG decode
        is not repeated per object."""
        rgb = LM6DDataset._read_image(
            self._vid(seq, frame, "color.png")).astype(np.float32) / 255.0
        dpath = self._vid(seq, frame, "depth.png")
        depth = (LM6DDataset._read_image(dpath).astype(np.float32)
                 / DEPTH_FACTOR if os.path.exists(dpath)
                 else np.zeros(rgb.shape[:2], np.float32))
        lpath = self._vid(seq, frame, "label.png")
        label = (LM6DDataset._read_image(lpath)
                 if os.path.exists(lpath) else None)
        return {"obs_rgb": rgb, "obs_depth": depth, "label": label}

    def frame_mask(self, raw: dict, seq: str, obj: str) -> np.ndarray:
        """One object's mask from a :meth:`load_frame_raw` dict.  Video
        labels use the per-sequence slot convention (pixel = 1 + slot in
        ``{seq}_objects.txt``); without a label, fall back to depth>0."""
        if raw["label"] is not None:
            slot = self.objects_in(seq).index(obj)
            return raw["label"] == (slot + 1)
        return raw["obs_depth"] > 0

    def load_keyframe(self, seq: str, frame: str, obj: str) -> dict:
        """One keyframe's observation for one object (RGB [0,1], metric
        depth, object mask)."""
        raw = self.load_frame_raw(seq, frame)
        return {"obs_rgb": raw["obs_rgb"], "obs_depth": raw["obs_depth"],
                "obs_mask": self.frame_mask(raw, seq, obj)}

    def keyframe_pose(self, seq: str, frame: str, obj: str) -> np.ndarray:
        return np.loadtxt(self._vid(seq, frame, f"pose_{obj}.txt"),
                          dtype=np.float32).reshape(3, 4)

    # -- writing (toolkit) -----------------------------------------------

    def write_sequence(self, seq: str, frame_ids: list[str], objs: list[str],
                       rgbs: np.ndarray, depths: np.ndarray,
                       poses: np.ndarray, init_poses: np.ndarray,
                       labels: np.ndarray | None = None) -> None:
        from PIL import Image

        d = os.path.join(self.root, "data", "video", seq)
        os.makedirs(d, exist_ok=True)
        os.makedirs(os.path.join(self.root, "video_sets"), exist_ok=True)
        os.makedirs(os.path.join(self.root, "init_poses"), exist_ok=True)
        for t, fid in enumerate(frame_ids):
            Image.fromarray(
                np.clip(rgbs[t] * 255, 0, 255).astype(np.uint8)
            ).save(self._vid(seq, fid, "color.png"))
            Image.fromarray(
                (depths[t] * DEPTH_FACTOR).astype(np.uint16)
            ).save(self._vid(seq, fid, "depth.png"))
            if labels is not None:
                Image.fromarray(labels[t].astype(np.uint8)).save(
                    self._vid(seq, fid, "label.png"))
            for m, o in enumerate(objs):
                np.savetxt(self._vid(seq, fid, f"pose_{o}.txt"),
                           poses[t, m])
        with open(os.path.join(self.root, "video_sets", f"{seq}.txt"),
                  "w") as f:
            f.write("\n".join(frame_ids) + "\n")
        with open(os.path.join(self.root, "video_sets",
                               f"{seq}_objects.txt"), "w") as f:
            f.write("\n".join(objs) + "\n")
        np.savetxt(os.path.join(self.root, "init_poses",
                                f"video_{seq}.txt"),
                   init_poses.reshape(-1, 12))


def convert_ycb_original(src_root: str, out_root: str,
                         class_names: list[str],
                         sequences: list[str] | None = None,
                         max_frames_per_seq: int | None = None,
                         ) -> VideoDataset:
    """Convert the ORIGINAL YCB-Video release layout into the video
    layout this framework reads (reference toolkit parity — the release
    with ``keyframe.txt`` + PoseCNN results, SURVEY.md §2.3):

        {src}/data/{seq}/{frame}-color.png, -depth.png, -label.png,
                         -meta.mat   # poses (3,4,n), cls_indexes (1-based
                                     # into the 21-class list), factor_depth
        {src}/models/{name}/textured.obj (or .ply)
        {src}/image_sets/keyframe.txt   # lines "{seq}/{frame}"

    ``class_names``: the release's 21 class names IN ORDER (cls_indexes
    are 1-based positions into it).  Frames are written incrementally
    (a sequence never materializes in memory); label pixels are remapped
    from global class ids to the per-sequence slot convention
    ``load_keyframe`` documents; poses are meters (as released); the
    keyframe list is passed through.
    """
    from PIL import Image
    from scipy.io import loadmat

    from deepim_tpu.data.lm6d import DEPTH_FACTOR as DF
    from deepim_tpu.raster.mesh import load_mesh

    ds = VideoDataset(out_root, list(class_names))
    data_dir = os.path.join(src_root, "data")
    seqs = sequences or sorted(os.listdir(data_dir))

    # models: the release ships textured.obj (+texture map) per class dir
    seen_classes: set[int] = set()
    for seq in seqs:
        sdir = os.path.join(data_dir, seq)
        frames = sorted({f.split("-")[0] for f in os.listdir(sdir)
                         if f.endswith("-color.png")})
        if max_frames_per_seq:
            frames = frames[:max_frames_per_seq]
        out_dir = os.path.join(out_root, "data", "video", seq)
        os.makedirs(out_dir, exist_ok=True)
        seq_cls: list[int] | None = None
        for fid in frames:
            meta = loadmat(os.path.join(sdir, f"{fid}-meta.mat"))
            cls_idx = np.asarray(meta["cls_indexes"]).reshape(-1)
            cls0 = [int(c) - 1 for c in cls_idx]  # 0-based class ids
            if seq_cls is None:
                seq_cls = cls0
                seen_classes.update(cls0)
            poses = np.asarray(meta["poses"], np.float32)  # (3, 4, n)
            factor = float(np.asarray(meta["factor_depth"]).reshape(-1)[0])
            for slot, ci in enumerate(cls0):
                np.savetxt(
                    os.path.join(out_dir,
                                 f"{fid}-pose_{class_names[ci]}.txt"),
                    poses[:, :, slot])
            # color: copy; depth: rescale release factor -> DEPTH_FACTOR
            Image.open(os.path.join(sdir, f"{fid}-color.png")).save(
                os.path.join(out_dir, f"{fid}-color.png"))
            dep = np.asarray(
                Image.open(os.path.join(sdir, f"{fid}-depth.png")),
                np.float32) / factor
            Image.fromarray((dep * DF).astype(np.uint16)).save(
                os.path.join(out_dir, f"{fid}-depth.png"))
            lab_path = os.path.join(sdir, f"{fid}-label.png")
            if os.path.exists(lab_path):
                lab = np.asarray(Image.open(lab_path))
                out_lab = np.zeros_like(lab, dtype=np.uint8)
                for slot, ci in enumerate(cls0):
                    out_lab[lab == ci + 1] = slot + 1  # global -> slot
                Image.fromarray(out_lab).save(
                    os.path.join(out_dir, f"{fid}-label.png"))
        os.makedirs(os.path.join(out_root, "video_sets"), exist_ok=True)
        with open(os.path.join(out_root, "video_sets", f"{seq}.txt"),
                  "w") as f:
            f.write("\n".join(frames) + "\n")
        with open(os.path.join(out_root, "video_sets",
                               f"{seq}_objects.txt"), "w") as f:
            f.write("\n".join(class_names[c] for c in seq_cls) + "\n")

    import shutil

    for ci in sorted(seen_classes):
        name = class_names[ci]
        mdir = os.path.join(src_root, "models", name)
        out_mdir = os.path.join(out_root, "models", name)
        if os.path.isdir(mdir):
            # copy the model directory verbatim (textured.obj + .mtl +
            # texture map) so the per-pixel texture path survives —
            # LM6DDataset.model_path probes textured.ply then .obj;
            # re-encoding to ASCII PLY would bake colors and drop the map
            os.makedirs(out_mdir, exist_ok=True)
            for fn in os.listdir(mdir):
                shutil.copy2(os.path.join(mdir, fn),
                             os.path.join(out_mdir, fn))
            load_mesh(ds._frames.model_path(name))  # validate it loads

    kf_src = os.path.join(src_root, "image_sets", "keyframe.txt")
    if os.path.exists(kf_src):
        with open(kf_src) as f:
            pairs = [tuple(ln.strip().split("/")) for ln in f
                     if ln.strip()]
        ds.write_keyframes([p for p in pairs if p[0] in set(seqs)])
    return ds


def keyframe_records(ds: VideoDataset):
    """Per-(keyframe, object) eval records from the keyframe list.

    The reference's YCB-Video protocol: every object present in a
    sequence is evaluated on every keyframe of that sequence, batched
    (no temporal propagation).  Returns ``FrameRecord`` rows (scene=seq)
    compatible with the LM6d eval path; init_pose is filled by
    perturbation or an external PoseCNN import downstream.
    """
    from deepim_tpu.data.lm6d import FrameRecord

    records = []
    obj_cache: dict[str, list[str]] = {}
    for seq, fid in ds.keyframes():
        if seq not in obj_cache:
            obj_cache[seq] = ds.objects_in(seq)
        for obj in obj_cache[seq]:
            records.append(FrameRecord(
                scene=seq, frame=fid, obj=obj,
                class_idx=ds.class_to_idx[obj],
                pose=ds.keyframe_pose(seq, fid, obj),
                init_pose=None,
            ))
    return records


def iter_keyframe_batches(ds: VideoDataset, records, batch_size: int,
                          pad_to: int | None = None):
    """Streamed stacked frame batches for keyframe records (the video
    counterpart of :func:`deepim_tpu.data.lm6d.iter_frame_batches`)."""
    n = pad_to or len(records)
    assert n % batch_size == 0, "pad_to must be a batch multiple"
    recs = list(records) + [records[-1]] * (n - len(records))
    for i in range(0, n, batch_size):
        # Records are grouped per keyframe (every object of a scene is a
        # row), so cache the decoded frame within the batch: a 5-object
        # scene decodes its PNGs once, not 5 times.
        cache: dict[tuple[str, str], dict] = {}
        frames = []
        for r in recs[i : i + batch_size]:
            key = (r.scene, r.frame)
            if key not in cache:
                cache[key] = ds.load_frame_raw(r.scene, r.frame)
            raw = cache[key]
            frames.append({
                "obs_rgb": raw["obs_rgb"],
                "obs_depth": raw["obs_depth"],
                "obs_mask": ds.frame_mask(raw, r.scene, r.obj),
            })
        yield {
            "obs_rgb": np.stack([f["obs_rgb"] for f in frames]),
            "obs_depth": np.stack([f["obs_depth"] for f in frames]),
            "obs_mask": np.stack([f["obs_mask"] for f in frames]),
        }


def _quat_to_mat_np(q: np.ndarray) -> np.ndarray:
    """(w, x, y, z) unit quaternion -> (3, 3) rotation (numpy, loader-side)."""
    w, x, y, z = q / np.linalg.norm(q)
    return np.asarray([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ], np.float32)


def apply_posecnn_mat_init(records, init: np.ndarray, results_dir: str,
                           obj_ids: list[int] | None = None,
                           pose_key: str = "poses") -> int:
    """Import PoseCNN's released per-keyframe results (.mat) as init poses.

    The PoseCNN release ships one MATLAB file per keyframe, named by the
    0-based keyframe.txt line number (``000000.mat``, ``000001.mat``, ...),
    each with ``rois`` (per detection; column 1 = 1-based YCB class id)
    and ``poses`` (per detection: 7 values, unit quaternion wxyz + txyz).
    ``records`` are :func:`keyframe_records` rows IN ORDER; ``obj_ids``
    maps record.class_idx to the release's 1-based class ids (defaults to
    class_idx + 1).  Mutates ``init`` in place; returns the match count.
    Reference parity: the YCB-Video dataset classes load PoseCNN results
    the same way (SURVEY.md §2.3 "PoseCNN init poses from released
    results").
    """
    from scipy.io import loadmat

    # keyframe index = position of (seq, frame) in keyframe.txt order,
    # recoverable from the records themselves (they were emitted in order).
    kf_index: dict[tuple[str, str], int] = {}
    for r in records:
        key = (r.scene, r.frame)
        if key not in kf_index:
            kf_index[key] = len(kf_index)

    matched = 0
    cache: dict[int, tuple[np.ndarray, np.ndarray] | None] = {}
    for i, rec in enumerate(records):
        ki = kf_index[(rec.scene, rec.frame)]
        if ki not in cache:
            path = os.path.join(results_dir, f"{ki:06d}.mat")
            if not os.path.exists(path):
                cache[ki] = None
            else:
                m = loadmat(path)
                cache[ki] = (np.atleast_2d(np.asarray(m["rois"])),
                             np.atleast_2d(np.asarray(m[pose_key])))
        hit = cache[ki]
        if hit is None:
            continue
        rois, poses = hit
        want = (obj_ids[rec.class_idx] if obj_ids else rec.class_idx + 1)
        rows = np.nonzero(rois[:, 1].astype(int) == int(want))[0]
        if rows.size == 0:
            continue
        p = np.asarray(poses[rows[0]], np.float32).reshape(-1)
        init[i, :, :3] = _quat_to_mat_np(p[:4])
        init[i, :, 3] = p[4:7]
        matched += 1
    return matched


def gen_video(root: str, meshes: dict, k: np.ndarray,
              image_size: tuple[int, int], num_frames: int = 10,
              num_sequences: int = 1, seed: int = 0,
              renderer: str = "xla",
              objects_per_sequence: int | None = None,
              occluders: int = 0) -> VideoDataset:
    """Generate smooth-trajectory sequences (toolkit parity: the reference
    consumes recorded YCB videos; here the framework's own renderer
    synthesizes them).

    Frames match the training observation domain: randomized lighting and
    a noise background.  ``objects_per_sequence`` splits the object set
    into groups per sequence (1 = single-object sequences, the LM6d-style
    tracking protocol; None = all objects per frame, the YCB-style scene).

    ``occluders`` adds that many untracked distractor boxes sweeping
    ACROSS the camera frustum in front of the tracked objects — the
    occlusion-induced track-loss regime of real YCB sequences.  Occluder
    pixels overwrite RGB/depth and zero the label (they are background to
    the trackers); GT poses are untouched.
    """
    import jax
    import jax.numpy as jnp

    from deepim_tpu.data.pairs import perturb_poses, sample_poses_in_frustum
    from deepim_tpu.data.synthetic import random_lighting
    from deepim_tpu.geometry.rotations import mat2quat, quat2mat, quat_slerp
    from deepim_tpu.refine import build_assets

    objects = list(meshes)
    ds = VideoDataset(root, objects)
    for o in objects:
        ds._frames.write_model(o, meshes[o])
    assets = build_assets([meshes[o] for o in objects], num_points=256)
    kj = jnp.asarray(k, jnp.float32)

    occ_assets = None
    if occluders:
        from deepim_tpu.raster.mesh import box_mesh

        rng = np.random.RandomState(seed + 91)
        occ_assets = build_assets(
            [box_mesh(tuple(rng.uniform(0.06, 0.14, 3)))
             for _ in range(occluders)],
            num_points=8,
        )

    group = objects_per_sequence or len(objects)
    groups = [
        list(range(g, min(g + group, len(objects))))
        for g in range(0, len(objects), group)
    ]

    seq_id = 0
    for s in range(num_sequences):
        for members in groups:
            m = len(members)
            objs = [objects[i] for i in members]
            key = jax.random.PRNGKey(seed + 101 * seq_id + 7)
            k0, k1, kn, kl, kb = jax.random.split(key, 5)
            start = sample_poses_in_frustum(k0, m, kj, image_size,
                                            z_range=(0.7, 1.1))
            end = perturb_poses(k1, start, rot_std_deg=25.0,
                                rot_max_deg=60.0,
                                trans_std=(0.08, 0.08, 0.1),
                                trans_max=(0.15, 0.15, 0.2))
            q0 = mat2quat(start[..., :3])
            q1 = mat2quat(end[..., :3])
            ts = jnp.linspace(0.0, 1.0, num_frames)
            poses = []
            for t in ts:
                q = quat_slerp(q0, q1, jnp.full((m,), t))
                tr = (1 - t) * start[..., 3] + t * end[..., 3]
                poses.append(
                    jnp.concatenate([quat2mat(q), tr[..., None]], -1)
                )
            poses = jnp.stack(poses)  # (T, M, 3, 4)

            cls = jnp.asarray(members, jnp.int32)
            light = random_lighting(kl)

            occ_poses = None
            if occ_assets is not None:
                # Straight front-crossing sweeps: x spans the frustum
                # width at an in-front depth over the middle of the clip,
                # guaranteeing transient full occlusions of the tracked
                # objects behind.
                ko = jax.random.fold_in(key, 33)
                kz, kyy, kr = jax.random.split(ko, 3)
                n_occ = occ_assets.num_classes
                z_occ = jax.random.uniform(kz, (n_occ,), minval=0.42,
                                           maxval=0.6)
                y_occ = jax.random.uniform(kyy, (n_occ,), minval=-0.06,
                                           maxval=0.06)
                ang = jax.random.uniform(kr, (n_occ, 3), minval=-1.5,
                                         maxval=1.5)
                from deepim_tpu.geometry.rotations import euler2mat

                r_occ = jax.vmap(euler2mat)(ang[:, 0], ang[:, 1], ang[:, 2])
                half_w = 0.55 * image_size[1] / float(k[0, 0])  # ~frustum
                sweep = jnp.linspace(-half_w, half_w, num_frames)
                occ_poses = []
                for t in range(num_frames):
                    x_t = (sweep[t] + jnp.arange(n_occ) * 0.08) * z_occ
                    tr = jnp.stack([x_t, y_occ, z_occ], -1)
                    occ_poses.append(
                        jnp.concatenate([r_occ, tr[..., None]], -1))

            rgbs, depths, labels = [], [], []
            for t in range(num_frames):
                rgb, dep, lab = _render_frame(assets, cls, poses[t], kj,
                                              image_size, renderer, light)
                if occ_poses is not None:
                    occ_cls = jnp.arange(occ_assets.num_classes, dtype=jnp.int32)
                    orgb, odep, _ = _render_frame(
                        occ_assets, occ_cls, occ_poses[t], kj, image_size,
                        renderer, light)
                    front = (odep > 0) & ((dep == 0) | (odep < dep))
                    rgb = jnp.where(front[..., None], orgb, rgb)
                    dep = jnp.where(front, odep, dep)
                    lab = jnp.where(front, 0, lab)
                bg = jax.random.uniform(
                    jax.random.fold_in(kb, t), rgb.shape
                )
                rgb = jnp.where((dep > 0)[..., None], rgb, bg)
                rgbs.append(rgb)
                depths.append(dep)
                labels.append(lab)
            inits = perturb_poses(kn, poses[0], rot_std_deg=10.0,
                                  rot_max_deg=30.0,
                                  trans_std=(0.01, 0.01, 0.03),
                                  trans_max=(0.03, 0.03, 0.08))
            ds.write_sequence(
                f"{seq_id:04d}", [f"{t:06d}" for t in range(num_frames)],
                objs, np.asarray(jnp.stack(rgbs)),
                np.asarray(jnp.stack(depths)), np.asarray(poses),
                np.asarray(inits),
                labels=np.asarray(jnp.stack(labels)),
            )
            seq_id += 1
    return ds


def _render_frame(assets, cls, poses, k, image_size, renderer,
                  lighting=None):
    import jax.numpy as jnp

    from deepim_tpu.raster.raster_xla import FLAT_LIGHTING
    from deepim_tpu.refine import gather_class
    from deepim_tpu.refine.refiner import render_crops, render_scene

    lighting = FLAT_LIGHTING if lighting is None else lighting
    m = cls.shape[0]
    ks1 = k[None]
    if renderer == "xla":
        # per-object render + depth merge (CPU path)
        rgbs, deps = [], []
        for j in range(m):
            ab = gather_class(assets, cls[j : j + 1])
            rgb, dep = render_crops(ab, poses[j : j + 1], ks1, image_size,
                                    "xla", lighting=lighting)
            rgbs.append(rgb[0])
            deps.append(dep[0])
        rgbs = jnp.stack(rgbs)
        deps = jnp.stack(deps)
        big = jnp.where(deps > 0, deps, jnp.inf)
        best = jnp.argmin(big, axis=0)
        hit = jnp.any(deps > 0, axis=0)
        depth = jnp.where(hit, jnp.min(big, axis=0), 0.0)
        rgb = jnp.take_along_axis(
            rgbs, best[None, ..., None].astype(jnp.int32), axis=0
        )[0]
        # label convention: pixel = 1 + object slot in the sequence's
        # object list (what load_sequence documents and cli.track expects)
        label = jnp.where(hit, best.astype(jnp.int32) + 1, 0)
        return jnp.where(hit[..., None], rgb, 0.0), depth, label
    rgb, depth = render_scene(
        assets, cls[None], poses[None], jnp.ones((1, m), bool), ks1,
        image_size, lighting=lighting,
        interpret=renderer == "pallas_interpret",
    )
    # The shared-z-buffer scene raster doesn't expose the per-pixel
    # winner, so recover the label from per-object depth renders (same
    # z-test as the merge; gen_video is an offline toolkit, the extra
    # renders are fine).
    deps = jnp.stack([
        render_crops(gather_class(assets, cls[j : j + 1]),
                     poses[j : j + 1], ks1, image_size, renderer,
                     lighting=lighting)[1][0]
        for j in range(m)
    ])
    big = jnp.where(deps > 0, deps, jnp.inf)
    hit = jnp.any(deps > 0, axis=0)
    label = jnp.where(hit, jnp.argmin(big, axis=0).astype(jnp.int32) + 1, 0)
    return rgb[0], depth[0], label
