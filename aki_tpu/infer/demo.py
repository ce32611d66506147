"""Local demo: interactive CLI chat + minimal web UI (stdlib http.server).

Counterpart of ``local_demo.py`` (Gradio): load a checkpoint, accept an
image + question, greedy-generate with the MMA engine.  Gradio is not in
the image, so the web demo is a dependency-free single-file server; the
prompt layout matches the eval/demo path.

Usage:
    python -m aki_tpu.infer.demo --checkpoint runs/sft [--tiny] \
        [--serve PORT | --image x.jpg --question "..."]
"""

from __future__ import annotations

import argparse
import io

import numpy as np
import jax
import jax.numpy as jnp

from ..data.images import decode_image, preprocess
from ..data.sft.templates import SYSTEM_MESSAGE
from ..data.tokenizer import load_tokenizer
from ..models.common import Policy
from ..models.configs import aki_4b, aki_tiny, config_for_tokenizer
from .engine import generate
from .eval_cv_bench import load_params
from .sampling import SamplingConfig

PROMPT = (
    "<s> <|system|>\n{system}<|end|>\n<|user|>\n<image>\n{question}<|end|>\n"
    "<|assistant|>\n"
)

PAGE = """<!doctype html><title>aki_tpu demo</title>
<h2>aki_tpu — AKI multimodal demo</h2>
<form method=post enctype=multipart/form-data action=/generate>
<p><input type=file name=image accept=image/*></p>
<p><textarea name=question rows=3 cols=60>What is in this image?</textarea></p>
<p><input type=submit value=Generate></p></form>"""


class DemoModel:
    def __init__(self, checkpoint, tokenizer_path, tiny=False,
                 max_new_tokens=256, num_beams=1, length_penalty=1.0,
                 no_repeat_ngram_size=0):
        self.tokenizer = load_tokenizer(tokenizer_path)
        base = aki_tiny(self.tokenizer.info.vocab_size) if tiny else aki_4b()
        self.cfg = config_for_tokenizer(base, self.tokenizer.info)
        self.params = load_params(checkpoint, self.cfg)
        self.policy = Policy(param_dtype=jnp.bfloat16)
        self.max_new_tokens = max_new_tokens
        self.num_beams = num_beams
        self.length_penalty = length_penalty
        self.no_repeat_ngram_size = no_repeat_ngram_size

    def answer(self, image_bytes: bytes, question: str,
               temperature: float = 0.0) -> str:
        img = preprocess(decode_image(image_bytes), self.cfg.siglip.image_size)
        prompt = PROMPT.format(system=SYSTEM_MESSAGE, question=question)
        ids = self.tokenizer.encode(prompt)  # reference eval/demo: add_special_tokens=False (eval.py:81)
        if self.num_beams > 1:
            # HF-generate parity surface (flamingo.py:156-162): beam search
            # with length penalty / ngram banning, greedy within beams
            from .beam import generate_beam

            tokens, num, _ = generate_beam(
                self.params, self.cfg,
                jnp.array([ids], jnp.int32), jnp.array(img[None]),
                jnp.ones((1, len(ids)), jnp.int32),
                max_new_tokens=self.max_new_tokens, max_len=1024,
                num_beams=self.num_beams,
                eos_id=self.tokenizer.info.end_id,
                length_penalty=self.length_penalty,
                no_repeat_ngram_size=self.no_repeat_ngram_size,
                policy=self.policy,
            )
            tokens, num = tokens[:, 0], num[:, 0]
        else:
            tokens, num = generate(
                self.params, self.cfg,
                jnp.array([ids], jnp.int32), jnp.array(img[None]),
                jnp.ones((1, len(ids)), jnp.int32),
                max_new_tokens=self.max_new_tokens, max_len=1024,
                eos_id=self.tokenizer.info.end_id,
                sampling=SamplingConfig(temperature=temperature),
                rng=jax.random.PRNGKey(np.random.randint(2 ** 31)),
                policy=self.policy,
            )
        return self.tokenizer.decode(np.asarray(tokens)[0][: int(num[0])])


def serve(model: DemoModel, port: int):
    from http.server import BaseHTTPRequestHandler, HTTPServer
    import cgi

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(PAGE.encode())

        def do_POST(self):
            form = cgi.FieldStorage(
                fp=self.rfile, headers=self.headers,
                environ={"REQUEST_METHOD": "POST",
                         "CONTENT_TYPE": self.headers["Content-Type"]},
            )
            image = form["image"].file.read()
            question = form.getvalue("question", "")
            try:
                answer = model.answer(image, question)
                body = PAGE + f"<h3>Answer</h3><pre>{answer}</pre>"
                code = 200
            except Exception as e:  # noqa: BLE001
                body, code = PAGE + f"<pre>error: {e}</pre>", 500
            self.send_response(code)
            self.send_header("Content-Type", "text/html")
            self.end_headers()
            self.wfile.write(body.encode())

        def log_message(self, *a):
            pass

    print(f"serving on http://0.0.0.0:{port}")
    HTTPServer(("0.0.0.0", port), Handler).serve_forever()


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default=None)
    ap.add_argument("--tokenizer", default=None)
    ap.add_argument("--tiny", action="store_true")
    ap.add_argument("--serve", type=int, default=None)
    ap.add_argument("--image", default=None)
    ap.add_argument("--question", default="What is in this image?")
    ap.add_argument("--temperature", type=float, default=0.0)
    ap.add_argument("--max-new-tokens", type=int, default=256)
    # HF-generate parity knobs (reference generate(), flamingo.py:156-162)
    ap.add_argument("--num-beams", type=int, default=1)
    ap.add_argument("--length-penalty", type=float, default=1.0)
    ap.add_argument("--no-repeat-ngram-size", type=int, default=0)
    args = ap.parse_args(argv)

    model = DemoModel(args.checkpoint, args.tokenizer, tiny=args.tiny,
                      max_new_tokens=args.max_new_tokens,
                      num_beams=args.num_beams,
                      length_penalty=args.length_penalty,
                      no_repeat_ngram_size=args.no_repeat_ngram_size)
    if args.serve:
        serve(model, args.serve)
        return
    assert args.image, "--image required in CLI mode"
    answer = model.answer(open(args.image, "rb").read(), args.question,
                          args.temperature)
    print(answer)


if __name__ == "__main__":
    main()
