"""Streamlit chat UI (reference analog: /root/reference/examples/web-ui.py).

Run: streamlit run web-ui.py -- --model ../models/chatglm2-6b-int4g32
(`streamlit` is an optional dependency; examples/cli_chat.py is the
dependency-free equivalent.)
"""
import argparse
import sys

try:
    import streamlit as st
except ImportError:
    print("streamlit is not installed; use examples/cli_chat.py instead")
    sys.exit(1)

parser = argparse.ArgumentParser()
parser.add_argument("--model", default="../models/chatglm2-6b-int4g32")
args, _ = parser.parse_known_args()

st.set_page_config(page_title="ChatGLM2 (TPU)", layout="wide")


@st.cache_resource
def load_decoder():
    from chatglm_q_tpu.serving import GLMDecoder

    return GLMDecoder.from_pretrained(args.model)


decoder = load_decoder()

with st.sidebar:
    st.title("Sampling")
    max_tokens = st.slider("max_tokens", 16, 2048, 400)
    temperature = st.slider("temperature", 0.0, 2.0, 1.0)
    top_p = st.slider("top_p", 0.1, 1.0, 0.8)
    top_k = st.slider("top_k", 1, 200, 100)
    if st.button("Clear history"):
        st.session_state.history = []

if "history" not in st.session_state:
    st.session_state.history = []

from chatglm_q_tpu.serving.chat import chat_template

for role, text in st.session_state.history:
    with st.chat_message(role):
        st.write(text)

if prompt := st.chat_input("说点什么…"):
    st.session_state.history.append(("user", prompt))
    with st.chat_message("user"):
        st.write(prompt)
    pairs = [
        (st.session_state.history[i][1], st.session_state.history[i + 1][1])
        for i in range(0, len(st.session_state.history) - 1, 2)
    ]
    full_prompt = chat_template(pairs, prompt)
    with st.chat_message("assistant"):
        box = st.empty()
        final = ""
        for partial in decoder.generate(
            full_prompt, max_generated_tokens=max_tokens,
            top_k=top_k, top_p=top_p, temperature=temperature,
        ):
            final = partial
            box.write(partial)
    st.session_state.history.append(("assistant", final))
