"""Launch the OpenAI-compatible API server over a checkpoint.

Production counterpart of the reference's Streamlit demo
(/root/reference/examples/web-ui.py): many concurrent HTTP clients are
multiplexed onto one continuous-batching engine on one TPU.

  python examples/api_server.py --model ../models/chatglm2-6b-int4g32 \
      --port 8000 --max-batch 8 [--paged] [--prefill-chunk 128]

Then talk to it with any OpenAI client:

  curl http://127.0.0.1:8000/v1/chat/completions -d '{
    "model": "chatglm2-6b", "stream": true,
    "messages": [{"role": "user", "content": "你好"}]}'
"""
import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True,
                    help="checkpoint dir or HF hub id (see loader.py)")
    ap.add_argument("--host", default="127.0.0.1")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--name", default="chatglm2-6b", help="served model name")
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--max-seq-len", type=int, default=None)
    ap.add_argument("--decode-chunk", type=int, default=16)
    ap.add_argument("--prefill-chunk", type=int, default=None,
                    help="chunked prefill size (long prompts never stall decode)")
    ap.add_argument("--paged", action="store_true",
                    help="paged KV engine with prefix caching")
    ap.add_argument("--lookahead", action="store_true",
                    help="overlap host scheduling with device compute")
    args = ap.parse_args()

    from chatglm_q_tpu.loader import load_model_and_tokenizer
    from chatglm_q_tpu.serving import ServingEngine, PagedServingEngine
    from chatglm_q_tpu.serving.api_server import GLMAPIServer

    config, params, tokenizer = load_model_and_tokenizer(args.model)
    kw = dict(max_batch=args.max_batch, max_seq_len=args.max_seq_len,
              decode_chunk=args.decode_chunk,
              prefill_chunk_size=args.prefill_chunk)
    if args.paged:
        engine = PagedServingEngine(config, params, tokenizer,
                                    prefix_cache=True, **kw)
    else:
        engine = ServingEngine(config, params, tokenizer,
                               lookahead=args.lookahead, **kw)
    server = GLMAPIServer(engine, host=args.host, port=args.port,
                          model_name=args.name)
    print(f"serving {args.name} on http://{server.host}:{server.port}/v1")
    server.serve()


if __name__ == "__main__":
    main()
