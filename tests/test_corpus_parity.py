"""Parity against the reference's own 6-PDF corpus.

The helloworld goldens are the reference's integration asserts
(tests/integration.rs:2-10). The other pins were produced by running
the actual reference binary side-by-side with this library (all modes
byte-identical) and frozen as sha256 regression guards.
"""

import hashlib

import pytest

from pdfrust_ray.pdfref import ParseError, extract
from tests.conftest import reference_pdf

PINS = {
    "helloworld.pdf:text": ("315f5bdb76d078c43b8ac0064e4a0164612b1fce77c869345bfc94c75894edd3", 13, 1),
    "helloworld.pdf:raw-content": ("28b41b522cc391c7e8aba9090384bc3071461c5f7fb23648026c8f7d593a0c13", 44, 1),
    "helloworld.pdf:chars": ("77e911809e579ac491df530dc9bafdf85d39ef63ca8ac60e1e7247cb7f07fd6d", 650, 1),
    "sample.pdf:text": ("a7fad0aa17d9425df73d382a56a84df8c0bf7935f14939561331eb83d5e288bc", 2879, 1),
    "sample.pdf:raw-content": ("115be0ca5ccb319f1e4799bc25a49616a23cb6e16378c08fbbcf8adcaf94eac5", 38660, 1),
    "sample.pdf:chars": ("c1c0cb36a634c30c48638372e1a11a443a1c29198bc5e5d3fbd7b46497d24685", 221499, 1),
    "002-trivial-libre-office-writer.pdf:text": ("6e57f612cda480433a419a5af1203b610fc9cd45ae438722a687fb2d48b66ed0", 597, 1),
    "002-trivial-libre-office-writer.pdf:raw-content": ("54e6d3815c259c1b530f1895128444596208754e675e83d508954d79b82d5a2b", 8230, 1),
    "002-trivial-libre-office-writer.pdf:chars": ("c7f969e38e74d77317826875c49f94f3a325d039313b45cfe3199dbf8e0c0f15", 41491, 1),
    "index.pdf:text": ("6bd4933129c7892eb4599887556ded7188c48cc225e2e28b9fd2ec761a6c3277", 923, 1),
    "index.pdf:raw-content": ("9020796630c3edd4dcf448d30933ce6bcf9e3319d06b36b7673d06c2f1288cf6", 10570, 1),
    "index.pdf:chars": ("b896140cfded935773f09e934646b91fc5606270ddecb00fe9b1cec781b22250", 60628, 1),
    "tracemonkey.pdf:text": ("ec2c3a2cd1e70f3b28e8373dc78510a1dfb97ec71e19d2a6ad9ac44ab1d7ea28", 68759, 14),
    "tracemonkey.pdf:raw-content": ("a897542815b48c761e1d8815925e8df71c8fa21c6f3d8aa2f2c5f154a57cc229", 688093, 14),
    "tracemonkey.pdf:chars": ("10a281165d428042e561012ccc8fb2c4153d1a100b5bff5ec10c06a976975c82", 5166547, 14),
}


def test_helloworld_golden():
    data = reference_pdf("helloworld.pdf")
    assert extract(data, "text").text == "Hello, world!"
    assert (
        extract(data, "raw-content").text
        == "BT\n70 50 TD\n/F1 12 Tf\n(Hello, world!) Tj\nET\n"
    )


@pytest.mark.parametrize("key", sorted(PINS))
def test_corpus_pin(key):
    name, mode = key.rsplit(":", 1)
    data = reference_pdf(name)
    r = extract(data, mode)
    digest = hashlib.sha256(r.text.encode()).hexdigest()
    assert (digest, len(r.text), r.n_pages) == PINS[key]


def test_xref_stream_pdf_fails_like_reference():
    # the reference's xref-stream path is broken (integration.rs:44-50
    # disabled); our engine turns the same failure into a ParseError
    data = reference_pdf("pdflatex-4-pages.pdf")
    with pytest.raises(ParseError):
        extract(data, "text")
