"""Parse the reference's own golden query corpus
(/root/reference/test/parsing/query/input/*.txt): every line in a
PASS file must parse; every line in a FAIL file must not."""

import glob
import os

import pytest

from fossil_spark.fql.parser import parse

CORPUS = "/root/reference/test/parsing/query/input"


def _cases():
    for path in sorted(glob.glob(os.path.join(CORPUS, "*.txt"))):
        with open(path) as f:
            lines = [l.rstrip("\n") for l in f]
        should_pass = lines[0].strip().upper() == "PASS"
        for i, query in enumerate(lines[1:], start=2):
            yield pytest.param(
                query, should_pass,
                id=f"{os.path.basename(path)}:{i}",
            )


corpus_available = pytest.mark.skipif(
    not os.path.isdir(CORPUS), reason="reference corpus not present"
)


@corpus_available
@pytest.mark.parametrize("query,should_pass", list(_cases()))
def test_reference_corpus(query, should_pass):
    if should_pass:
        parse(query)  # must not raise
    else:
        with pytest.raises(Exception):
            parse(query)
