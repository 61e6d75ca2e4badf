#!/usr/bin/env python
"""Build clover_tpu jsonl annotations from public dataset releases.

Replaces the reference's out-of-band ``.pkl`` annotation files (schema
visible in mmaction/datasets/video_dataset.py) with reproducible builders
over the datasets' public annotation formats.

Examples:
  # MSRVTT 9k train + 1k-A test
  python tools/build_annotations.py msrvtt \
      --data-json MSRVTT_data.json --split-csv MSRVTT_train.9k.csv \
      --out anns/msrvtt_train.jsonl
  python tools/build_annotations.py msrvtt \
      --data-json MSRVTT_data.json --split-csv MSRVTT_JSFUSION_test.csv \
      --out anns/msrvtt_test_1ka.jsonl

  # MSVD-QA with answer vocabulary
  python tools/build_annotations.py videoqa-json --qa-json train_qa.json \
      --id-to-name youtube_mapping.txt --ext .avi \
      --out anns/msvdqa_train.jsonl --answer-vocab anns/msvdqa_vocab.json
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from clover_tpu.data import annotations as A


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    sp = sub.add_parser("msrvtt", help="MSRVTT retrieval (MSRVTT_data.json)")
    sp.add_argument("--data-json", required=True)
    sp.add_argument("--split-csv")
    sp.add_argument("--split", default="train")
    sp.add_argument("--ext", default=".mp4")

    sp = sub.add_parser("msrvtt-mc", help="MSRVTT-MC (JSFUSION mc_test.csv)")
    sp.add_argument("--mc-csv", required=True)
    sp.add_argument("--ext", default=".mp4")

    sp = sub.add_parser("msvd", help="MSVD retrieval (caption txt + split list)")
    sp.add_argument("--captions-txt", required=True)
    sp.add_argument("--split-list")
    sp.add_argument("--name-map")
    sp.add_argument("--ext", default=".avi")

    sp = sub.add_parser("didemo", help="DiDeMo paragraph retrieval (split json)")
    sp.add_argument("--split-json", required=True)
    sp.add_argument("--ext", default=".mp4")

    sp = sub.add_parser("lsmdc", help="LSMDC retrieval (LSMDC16_annos_*.csv)")
    sp.add_argument("--annos-csv", required=True)
    sp.add_argument("--ext", default=".avi")

    sp = sub.add_parser("lsmdc-mc", help="LSMDC multiple-choice TSV")
    sp.add_argument("--mc-csv", required=True)
    sp.add_argument("--ext", default=".avi")

    sp = sub.add_parser("lsmdc-fib", help="LSMDC fill-in-the-blank TSV")
    sp.add_argument("--fib-csv", required=True)
    sp.add_argument("--ext", default=".avi")

    sp = sub.add_parser("tgif", help="TGIF-QA TSV (action/transition/frameqa)")
    sp.add_argument("--question-csv", required=True)
    sp.add_argument("--task", default="action",
                    choices=["action", "transition", "frameqa"])

    sp = sub.add_parser("videoqa-json",
                        help="MSRVTT-QA / MSVD-QA json (question/answer/video_id)")
    sp.add_argument("--qa-json", required=True)
    sp.add_argument("--id-to-name")
    sp.add_argument("--prefix", default="video")
    sp.add_argument("--ext", default=".mp4")

    for name, spp in sub.choices.items():
        spp.add_argument("--out", required=True, help="output jsonl path")
        spp.add_argument("--answer-vocab",
                         help="also write an answer vocab json (OE QA only)")
        spp.add_argument("--vocab-size", type=int, default=1000)

    args = p.parse_args(argv)

    if args.cmd == "msrvtt":
        recs = A.build_msrvtt_retrieval(args.data_json, args.split_csv,
                                        args.split, args.ext)
    elif args.cmd == "msrvtt-mc":
        recs = A.build_msrvtt_mc(args.mc_csv, args.ext)
    elif args.cmd == "msvd":
        recs = A.build_msvd_retrieval(args.captions_txt, args.split_list,
                                      args.name_map, args.ext)
    elif args.cmd == "didemo":
        recs = A.build_didemo_retrieval(args.split_json, args.ext)
    elif args.cmd == "lsmdc":
        recs = A.build_lsmdc_retrieval(args.annos_csv, args.ext)
    elif args.cmd == "lsmdc-mc":
        recs = A.build_lsmdc_mc(args.mc_csv, args.ext)
    elif args.cmd == "lsmdc-fib":
        recs = A.build_lsmdc_fib(args.fib_csv, args.ext)
    elif args.cmd == "tgif":
        recs = A.build_tgif_qa(args.question_csv, args.task)
    elif args.cmd == "videoqa-json":
        recs = A.build_videoqa_json(args.qa_json, args.id_to_name,
                                    args.prefix, args.ext)
    else:  # pragma: no cover
        p.error(f"unknown command {args.cmd}")

    n = A.write_jsonl(recs, args.out)
    print(f"wrote {n} records -> {args.out}")
    if args.answer_vocab:
        vocab = A.build_answer_vocab(recs, args.vocab_size)
        A.save_answer_vocab(vocab, args.answer_vocab)
        print(f"wrote {len(vocab)}-entry answer vocab -> {args.answer_vocab}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
