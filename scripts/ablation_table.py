"""Open-Pose+ 3D-readout ablation table (the reference's ablation instrument).

The reference's ablation study scores the SAME trained model through
alternative 3D channels to attribute error between the 2D localizer and the
depth readout (reference:
evaluation_rtpose_light3d_kdh3d_mpreal_ablation.py:432-545):

- pose_depth            predicted 2D + learned pose-depth readout (the main row)
- raw_depth             predicted 2D + raw depth-map readout at the 2D point
- perfect_2d            GT 2D       + learned pose-depth readout
- perfect_2d_visible    visible-GT 2D + learned pose-depth readout
- perfect_2d_raw_depth  GT 2D       + raw depth-map readout (the ceiling)

This script reproduces that instrument on the frozen disjoint-seed synthetic
val benchmark (the same 64-scene seed-777 set behind method_table.json),
with the 20k-step generalization-trained Open-Pose+ weights: every channel
comes out of ONE `run_openpose_eval` pass (the prediction JSON carries the
full ablation contract) scored by `evaluate_ablation_channels`.

Run on the chip:  python scripts/ablation_table.py
Env knobs: ABL_DIR (dataset workdir, default reuses /tmp/mtable),
           ABL_WEIGHTS (npz, default examples/results/bench_weights_openpose.npz)
Writes examples/results/ablation_channels.json;
tests/test_method_table.py pins it.
"""

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402

OUT = os.path.join(REPO, "examples", "results", "ablation_channels.json")


def main():
    from popnet_tpu.cli import evaluate as ev
    from popnet_tpu.cli.main import main as cli
    from popnet_tpu.core.config import DecodeConfig, EncoderConfig
    from popnet_tpu.data.datasets import MPRealDataset
    from popnet_tpu.models import RTPoseLight3D
    from popnet_tpu.serving import variables_from_npz

    from tests import synthetic_data

    work = os.environ.get("ABL_DIR", "/tmp/mtable")
    weights = os.environ.get(
        "ABL_WEIGHTS",
        os.path.join(REPO, "examples", "results", "bench_weights_openpose.npz"),
    )
    n_val = int(os.environ.get("ABL_VAL", "64"))

    val_root = os.path.join(work, "val")
    frozen = os.path.join(work, "val_frozen")
    if not os.path.exists(os.path.join(val_root, "labels_loc4.json")):
        synthetic_data.build(val_root, n_images=n_val, n_locations=5, seed=777)
    if not os.path.exists(os.path.join(frozen, "labels_test.json")):
        cli(["generate-augset", "--kind", "mpaug", "--data-root", val_root,
             "--out-dir", frozen, "--seed", "777"])

    ecfg = EncoderConfig()
    dcfg = DecodeConfig()
    frozen_ds = MPRealDataset(
        os.path.join(frozen, "depth_maps"),
        os.path.join(frozen, "labels_test.json"), ecfg=ecfg,
    )

    model = RTPoseLight3D()
    v = variables_from_npz(weights)

    def infer(images):
        (paf, heat, z), _ = model.apply(v, images, train=False)
        return paf, heat, z

    data = ev.run_openpose_eval(infer, frozen_ds, 16, ecfg, dcfg,
                                device_decode=True)
    main_metrics = {k: round(float(val), 4)
                    for k, val in ev.evaluate_eval_data(
                        data, verbose=False).items()
                    if not k.startswith("per_")}
    channels = {k: round(float(val), 4)
                for k, val in ev.evaluate_ablation_channels(data).items()}

    out = {
        "weights": os.path.relpath(weights, REPO),
        "val_images": len(frozen_ds),
        "val_seed": 777,
        "main": main_metrics,
        "pck3d_channels": channels,
    }
    with open(OUT, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out, indent=2))
    print(f"[ablation] wrote {OUT}", flush=True)


if __name__ == "__main__":
    main()
