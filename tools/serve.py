"""Persistent CRIS serving daemon (model + tokenizer stay warm).

  python tools/serve.py --config config/refcoco/cris_r50.yaml \
      [--checkpoint exp/refcoco/CRIS_R50] [--host 0.0.0.0] [--port 8080] \
      [--max-batch 16] [--opts KEY VALUE ...]

Endpoints:
  GET  /healthz   -> {"status": "ok", "input_size": ...}
  POST /predict   <- {"image_b64" | "image_path", "sentence" |
                      "sentences": [...], "format": "png_b64" | "rle"}
                  -> {"height", "width", "results": [{"sentence",
                      "foreground_px", "mask_png_b64" | "rle"}]}

Example:
  curl -s localhost:8080/predict -d '{"image_path": "photo.jpg",
      "sentences": ["the man in red"], "format": "rle"}'
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="CRIS-TPU serving daemon")
    parser.add_argument("--config", required=True)
    parser.add_argument("--checkpoint", default="",
                        help="checkpoint dir (default {output_dir})")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--max-batch", type=int, default=16,
                    help="measured serving optimum (tools/bench_batch_sweep.py)")
    parser.add_argument("--no-fold-bn", action="store_true")
    parser.add_argument("--opts", default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()

    from cris_tpu.serving import PredictService, serve
    from cris_tpu.utils import config as config_lib
    from cris_tpu.utils import setup_logger

    cfg = config_lib.load_cfg_from_cfg_file(args.config)
    if args.opts:
        cfg = config_lib.merge_cfg_from_list(cfg, args.opts)
    setup_logger(None)

    service = PredictService(
        cfg,
        model_dir=args.checkpoint or None,
        max_batch=args.max_batch,
        fold_bn=not args.no_fold_bn,
    )
    serve(service, args.host, args.port)


if __name__ == "__main__":
    main()
