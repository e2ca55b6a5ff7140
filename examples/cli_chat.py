"""Terminal chat client (dependency-free alternative to web-ui.py)."""
import argparse

parser = argparse.ArgumentParser()
parser.add_argument("--model", default="../models/chatglm2-6b-int4g32")
parser.add_argument("--max-tokens", type=int, default=400)
parser.add_argument("--temperature", type=float, default=1.0)
parser.add_argument("--top-p", type=float, default=0.8)
parser.add_argument("--top-k", type=int, default=100)
parser.add_argument("--time-log", action="store_true")
args = parser.parse_args()

from chatglm_q_tpu.serving import GLMDecoder
from chatglm_q_tpu.serving.chat import chat_template

decoder = GLMDecoder.from_pretrained(args.model, time_log=args.time_log)
history: list[tuple[str, str]] = []

print("ChatGLM2 on TPU — empty line to quit, '/clear' to reset history")
while True:
    try:
        query = input("\n问：").strip()
    except (EOFError, KeyboardInterrupt):
        break
    if not query:
        break
    if query == "/clear":
        history = []
        continue
    prompt = chat_template(history, query)
    shown = 0
    answer = ""
    print("答：", end="", flush=True)
    for partial in decoder.generate(
        prompt, max_generated_tokens=args.max_tokens,
        top_k=args.top_k, top_p=args.top_p, temperature=args.temperature,
    ):
        print(partial[shown:], end="", flush=True)
        shown = len(partial)
        answer = partial
    print()
    history.append((query, answer))
