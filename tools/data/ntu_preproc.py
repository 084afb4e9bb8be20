#!/usr/bin/env python
"""NTU RGB+D raw .skeleton -> annotation pickle preprocessing.

Behavioral parity with the reference tools/data/ntu_preproc.py: parses the raw
skeleton files, applies the multi-body denoising heuristics (motion variance
ranking, spread denoising, short-track filtering), assembles up to two bodies
into (2, T, 25, 3), and writes ntu60/ntu120 annotation pickles with
xsub/xview/xset splits.

Usage: python tools/data/ntu_preproc.py --root nturgb+d_skeletons \
           [--missing ntu120_missing.txt] [--out-dir data/nturgbd] [--workers 8]
"""
import argparse
import copy as cp
import multiprocessing as mp
import os
import os.path as osp
import pickle
import sys

import numpy as np

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

EPS = 1e-3

# x-sub training subject ids (reference ntu_preproc.py:182-186)
TRAINING_SUBJECTS = [
    1, 2, 4, 5, 8, 9, 13, 14, 15, 16, 17, 18, 19, 25, 27, 28, 31, 34, 35,
    38, 45, 46, 47, 49, 50, 52, 53, 54, 55, 56, 57, 58, 59, 70, 74, 78,
    80, 81, 82, 83, 84, 85, 86, 89, 91, 92, 93, 94, 95, 97, 98, 100, 103
]


def read_lines(path):
    with open(path) as f:
        return [ln.strip() for ln in f]


def parse_skeleton_file(ske_name, root):
    """Parse one raw .skeleton file into per-bodyID keypoint tracks
    (reference ntu_preproc.py:14-53)."""
    lines = read_lines(osp.join(root, ske_name + ".skeleton"))
    idx = 0
    num_frames = int(lines[0])
    idx += 1
    body_data = {}
    fidx = 0
    for _ in range(num_frames):
        num_bodies = int(lines[idx])
        idx += 1
        if num_bodies == 0:
            continue
        for _ in range(num_bodies):
            body_id = int(lines[idx].split()[0])
            if body_id not in body_data:
                body_data[body_id] = dict(kpt=[], start=fidx)
            idx += 1
            assert int(lines[idx]) == 25
            idx += 1
            joints = np.zeros((25, 3), np.float32)
            for j in range(25):
                joints[j] = np.array(lines[idx].split()[:3], np.float32)
                idx += 1
            body_data[body_id]["kpt"].append(joints)
        fidx += 1
    for k in body_data:
        body_data[k]["motion"] = float(np.sum(np.var(
            np.vstack(body_data[k]["kpt"]), axis=0)))
        body_data[k]["kpt"] = np.stack(body_data[k]["kpt"])
    assert idx == len(lines)
    return body_data


def spread_denoising(tracks):
    """Drop tracks whose x-spread dominates y-spread in most frames
    (reference ntu_preproc.py:57-84)."""
    wh_ratio, spnoise_ratio = 0.8, 0.69754

    def valid_frames(kpt):
        out = []
        for i in range(kpt.shape[0]):
            x, y = kpt[i, :, 0], kpt[i, :, 1]
            if (x.max() - x.min()) <= wh_ratio * (y.max() - y.min()):
                out.append(i)
        return out

    for item in tracks:
        vf = valid_frames(item["kpt"])
        if len(vf) == item["kpt"].shape[0]:
            item["flag"] = True
            continue
        ratio = len(vf) / item["kpt"].shape[0]
        if 1 - ratio >= spnoise_ratio:
            item["flag"] = False
        else:
            item["flag"] = True
            item["motion"] = min(item["motion"], float(np.sum(np.var(
                item["kpt"][vf].reshape(-1, 3), axis=0))))
    tracks = [t for t in tracks if t["flag"]]
    assert len(tracks) >= 1
    for t in tracks:
        t.pop("flag")
    tracks.sort(key=lambda x: -x["motion"])
    return tracks


def _trim_empty(kpt):
    s, e = 0, kpt.shape[1]
    while np.sum(np.abs(kpt[:, s])) < EPS:
        s += 1
    while np.sum(np.abs(kpt[:, e - 1])) < EPS:
        e -= 1
    return kpt[:, s:e]


def gen_keypoint_array(body_data):
    """Assemble denoised tracks into a (M<=2, T, 25, 3) array
    (reference ntu_preproc.py:97-131)."""
    length_threshold = 11
    tracks = cp.deepcopy(list(body_data.values()))
    tracks.sort(key=lambda x: -x["motion"])
    if len(tracks) == 1:
        return tracks[0]["kpt"][None]
    tracks = [t for t in tracks if t["kpt"].shape[0] > length_threshold]
    if len(tracks) == 1:
        return tracks[0]["kpt"][None]
    tracks = spread_denoising(tracks)
    if len(tracks) == 1:
        return tracks[0]["kpt"][None]

    max_fidx = max(t["start"] + t["kpt"].shape[0] for t in tracks)
    keypoint = np.zeros((2, max_fidx, 25, 3), np.float32)
    s1 = tracks[0]["start"]
    e1 = s1 + tracks[0]["kpt"].shape[0]
    s2 = e2 = 0
    keypoint[0, s1:e1] = tracks[0]["kpt"]
    for t in tracks[1:]:
        s, e = t["start"], t["start"] + t["kpt"].shape[0]
        if max(s1, s) >= min(e1, e):
            keypoint[0, s:e] = t["kpt"]
            s1, e1 = min(s, s1), max(e, e1)
        elif max(s2, s) >= min(e2, e):
            keypoint[1, s:e] = t["kpt"]
            s2, e2 = min(s, s2), max(e, e2)
    keypoint = _trim_empty(keypoint)
    if np.sum(np.abs(keypoint[0, 0, 1])) < EPS and \
            np.sum(np.abs(keypoint[1, 0, 1])) > EPS:
        keypoint = keypoint[::-1]
    return keypoint


def gen_anno(args):
    name, root = args
    body_data = parse_skeleton_file(name, root)
    if not body_data:
        return None
    keypoint = gen_keypoint_array(body_data).astype(np.float16)
    label = int(name.split("A")[-1]) - 1
    return dict(frame_dir=name, label=label, keypoint=keypoint,
                total_frames=keypoint.shape[1])


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--root", default="nturgb+d_skeletons")
    p.add_argument("--missing", default=None)
    p.add_argument("--out-dir", default=".")
    p.add_argument("--workers", type=int, default=8)
    args = p.parse_args()

    names = sorted(x.split(".")[0] for x in os.listdir(args.root)
                   if x.endswith(".skeleton"))
    if args.missing:
        missing = set(read_lines(args.missing))
        names = [x for x in names if x not in missing]
    extended = any(int(n.split("A")[-1]) > 60 for n in names)
    print(f"{len(names)} files; ntu120={extended}")

    if args.workers > 1:
        with mp.Pool(args.workers) as pool:
            annos = pool.map(gen_anno, [(n, args.root) for n in names])
    else:
        annos = [gen_anno((n, args.root)) for n in names]
    anno_dict = {n: a for n, a in zip(names, annos) if a is not None}
    names = [n for n in names if n in anno_dict]

    os.makedirs(args.out_dir, exist_ok=True)

    def dump(split, subset, fname):
        data = dict(split=split, annotations=[anno_dict[n] for n in subset])
        path = osp.join(args.out_dir, fname)
        with open(path, "wb") as f:
            pickle.dump(data, f)
        print(f"wrote {path} ({len(subset)} annos)")

    if extended:
        xsub_tr = [n for n in names
                   if int(n.split("P")[1][:3]) in TRAINING_SUBJECTS]
        xsub_va = [n for n in names if n not in set(xsub_tr)]
        xset_tr = [n for n in names if int(n.split("S")[1][:3]) % 2 == 0]
        xset_va = [n for n in names if int(n.split("S")[1][:3]) % 2 == 1]
        dump(dict(xsub_train=xsub_tr, xsub_val=xsub_va,
                  xset_train=xset_tr, xset_val=xset_va), names,
             "ntu120_3danno.pkl")

    n60 = [n for n in names if int(n.split("A")[-1]) <= 60]
    xsub_tr = [n for n in n60 if int(n.split("P")[1][:3]) in TRAINING_SUBJECTS]
    xsub_va = [n for n in n60 if n not in set(xsub_tr)]
    xview_tr = [n for n in n60 if "C001" not in n]
    xview_va = [n for n in n60 if "C001" in n]
    dump(dict(xsub_train=xsub_tr, xsub_val=xsub_va,
              xview_train=xview_tr, xview_val=xview_va), n60,
         "ntu60_3danno.pkl")


if __name__ == "__main__":
    main()
