"""Inference playground — script equivalent of the reference's
notebooks/inference_playground.ipynb (three parts: quick demo, VToonify-D
walkthrough, style-control walkthrough).

Run with reference checkpoints laid out as in checkpoint/README.md:

    python examples/inference_playground.py \
        --checkpoint_root ./checkpoint --content data/077436.jpg
"""

from __future__ import annotations

import argparse
import os


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint_root", default="./checkpoint")
    ap.add_argument("--content", default="./data/077436.jpg")
    ap.add_argument("--out", default="./output/playground")
    ap.add_argument("--landmarks", default=None,
                    help="precomputed 68-pt landmarks .npy (dlib-free)")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    import cv2
    import numpy as np

    from vtoonify_tpu.pipeline.model_api import Model

    # ---- Part 1: one-call demo ---------------------------------------------
    m = Model(checkpoint_root=args.checkpoint_root,
              landmarks=args.landmarks)
    frame, aligned, msg = m.detect_and_align_image(args.content)
    print("align:", msg)
    out = m.image_toonify(frame, aligned, style_degree=0.5,
                          style_type="cartoon1")
    cv2.imwrite(os.path.join(args.out, "demo_cartoon1.jpg"),
                cv2.cvtColor(out, cv2.COLOR_RGB2BGR))

    # ---- Part 2: VToonify-D walkthrough ------------------------------------
    # The pipeline pieces, spelled out (what Model does internally):
    pipe = m.load_model("cartoon1-d")
    s_w = pipe.compute_style(aligned, color_transfer=False)
    for d_s in (0.0, 0.5, 1.0):
        img = pipe.process_image(frame, s_w, d_s)
        cv2.imwrite(os.path.join(args.out, f"walkthrough_ds{d_s:.1f}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    print("style-degree sweep written")

    # ---- Part 3: style control ---------------------------------------------
    # Different exemplars of the same model (vtoonify_s_d.pt supports all
    # style ids) + color transfer on/off.
    for style_type in ("cartoon1-d", "cartoon2-d", "cartoon3-d"):
        img = m.image_toonify(frame, aligned, style_degree=0.6,
                              style_type=style_type)
        cv2.imwrite(os.path.join(args.out, f"style_{style_type}.jpg"),
                    cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    img = m.image_toonify(frame, aligned, style_degree=0.6,
                          style_type="cartoon1-d", color_transfer=True)
    cv2.imwrite(os.path.join(args.out, "style_color_transfer.jpg"),
                cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    print("done →", args.out)


if __name__ == "__main__":
    main()
