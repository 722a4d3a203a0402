"""Train briefly, freeze the checkpoint into a StableHLO serving artifact,
then serve it from the artifact bytes alone.

The reference's six binaries train only (resnet.cu:3222-3429); this is the
deployment surface: resnet_tpu.export bakes the trained weights and running
BN statistics into a portable program with a symbolic batch dimension.

Run: python examples/export_serving.py [--model tiny] [--steps 5]
"""

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="tiny")
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--batch-size", type=int, default=8)
    args = ap.parse_args()

    from resnet_tpu.config import (
        DataConfig,
        ExecutionConfig,
        OptimizerConfig,
        TrainConfig,
        model_config,
        tiny_model_config,
    )
    from resnet_tpu.export import (
        export_inference_from_state,
        load_inference,
        save_inference,
    )
    from resnet_tpu.train import Trainer

    mcfg = (
        tiny_model_config()
        if args.model == "tiny"
        else model_config(args.model)
    )
    cfg = TrainConfig(
        model=mcfg,
        execution=ExecutionConfig(),
        optimizer=OptimizerConfig(learning_rate=1e-3),
        data=DataConfig(batch_size=args.batch_size, synthetic=True),
    )
    trainer = Trainer(cfg, use_mesh=False)
    trainer.run(num_steps=args.steps)

    exported = export_inference_from_state(trainer.state, cfg)
    with tempfile.TemporaryDirectory() as d:
        path = save_inference(f"{d}/model.stablehlo", exported)
        served = load_inference(path)  # only the artifact bytes from here on
        for n in (1, 4):
            x = np.random.default_rng(0).normal(
                0, 50, (n, mcfg.input_dim, mcfg.input_dim, 3)
            ).astype(np.float32)
            logits = np.asarray(served.call(x))
            print(
                f"served batch {n}: logits {logits.shape}, "
                f"top-1 {logits.argmax(-1).tolist()}"
            )


if __name__ == "__main__":
    main()
