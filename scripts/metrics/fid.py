"""FID scoring (reference scripts/metrics/fid.py:19-27).

Prefers clean-fid (mode="legacy_pytorch", custom COCO stats) for bit-exact
protocol parity; falls back to a torchvision-Inception FID when clean-fid is
absent. Host-side tool — generation happens on TPU, scoring on CPU/GPU.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))


def cleanfid_score(gen_dir, dataset_name, dataset_split):
    from cleanfid import fid

    return fid.compute_fid(
        gen_dir, dataset_name=dataset_name, mode="legacy_pytorch",
        dataset_split=dataset_split,
    )


def torch_fid(gen_dir, ref_dir, batch_size=32):
    """InceptionV3 pool3 FID over two .npy/.png image dirs."""
    import numpy as np
    import torch
    from torchvision.models import inception_v3

    from unlearn_ft_tpu.utils.image_io import iter_images

    model = inception_v3(weights="DEFAULT", transform_input=False)
    model.fc = torch.nn.Identity()
    model.eval()

    @torch.no_grad()
    def features(d):
        feats = []
        batch = []
        for img in iter_images(d):
            x = torch.from_numpy(img).permute(2, 0, 1).float() / 255.0
            x = torch.nn.functional.interpolate(
                x[None], size=(299, 299), mode="bilinear", align_corners=False
            )[0]
            x = (x - 0.5) / 0.5
            batch.append(x)
            if len(batch) == batch_size:
                feats.append(model(torch.stack(batch)).numpy())
                batch = []
        if batch:
            feats.append(model(torch.stack(batch)).numpy())
        return np.concatenate(feats)

    import scipy.linalg

    f1, f2 = features(gen_dir), features(ref_dir)
    mu1, mu2 = f1.mean(0), f2.mean(0)
    s1 = np.cov(f1, rowvar=False)
    s2 = np.cov(f2, rowvar=False)
    covmean = scipy.linalg.sqrtm(s1 @ s2).real
    return float(((mu1 - mu2) ** 2).sum() + np.trace(s1 + s2 - 2 * covmean))


def main(argv=None):
    import json

    p = argparse.ArgumentParser()
    p.add_argument("--gen_dir", required=True)
    p.add_argument("--dataset_name", default="coco_val_2017")
    p.add_argument("--dataset_split", default="custom")
    p.add_argument("--ref_dir", default=None, help="fallback: reference image dir")
    args = p.parse_args(argv)

    try:
        score = cleanfid_score(args.gen_dir, args.dataset_name, args.dataset_split)
        protocol = "cleanfid-legacy_pytorch"
    except ImportError:
        assert args.ref_dir, "clean-fid unavailable; --ref_dir required for fallback FID"
        score = torch_fid(args.gen_dir, args.ref_dir)
        protocol = "torchvision-fallback"
        # the fallback's Inception weights/resize differ from clean-fid
        # legacy_pytorch: its numbers are NOT comparable to the paper's
        # protocol (reference fid.py:21 pins mode="legacy_pytorch")
        print(
            "WARNING: clean-fid unavailable — torchvision-Inception fallback "
            "FID is NOT the reference protocol; do not compare against "
            "clean-fid legacy_pytorch numbers",
            file=sys.stderr,
        )
    # machine-readable, self-describing output (last line is JSON)
    print(f"FID ({protocol}): {score:.4f}")
    print(json.dumps({"metric": "fid", "value": round(float(score), 4),
                      "protocol": protocol}))


if __name__ == "__main__":
    main()
