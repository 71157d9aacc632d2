"""Train the dynamic-object detector on synthetic scenes and write the
shipped weights artifact (ground_fusion_tpu/detector/weights.npz) — the
counterpart of the reference's pretrained darknet weights
(vins_estimator/yolo_network_config/).

    python scripts/train_detector.py [steps] [out.npz]
"""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# train on local CPU by default: the remote-tunnel TPU pays a network
# round-trip per step for host-generated batches (pass --tpu to override)
if "--tpu" not in sys.argv:
    import jax
    jax.config.update("jax_platforms", "cpu")
sys.argv = [a for a in sys.argv if a != "--tpu"]

from ground_fusion_tpu.detector.model import save_npz
from ground_fusion_tpu.detector.train import train

steps = int(sys.argv[1]) if len(sys.argv) > 1 else 400
out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "ground_fusion_tpu", "detector", "weights.npz")
params = train(steps=steps)
save_npz(out, params)
print(f"weights written to {out}")
