"""Tokenizer for FQL.

Token vocabulary matches the reference scanner
(/root/reference/pkg/query/scanner/token.go): keywords, identifiers,
integer/float/string literals, topics, time whences (~now / ~(...)),
timespans (@second..@year), comparison and arithmetic operators,
comma/colon/pipe/arrow and brackets.
"""

from __future__ import annotations

from dataclasses import dataclass

KEYWORDS = {"all", "sample", "in", "since", "before", "between", "filter", "map", "reduce"}
TIMESPANS = {"@second", "@minute", "@hour", "@day", "@week", "@month", "@year"}

# token types
EOF = "EOF"
KEYWORD = "KEYWORD"
IDENT = "IDENT"
INTEGER = "INTEGER"
FLOAT = "FLOAT"
STRING = "STRING"
TOPIC = "TOPIC"
WHENCE = "WHENCE"
TIMESPAN = "TIMESPAN"
OP = "OP"  # lexeme is one of: , : | -> ( ) [ ] + - * / > >= < <= == !=


@dataclass
class Token:
    type: str
    lexeme: str
    pos: int


class ScanError(ValueError):
    def __init__(self, msg: str, pos: int):
        super().__init__(f"{msg} (at position {pos})")
        self.pos = pos


def scan(text: str) -> list[Token]:
    toks: list[Token] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c.isspace():
            i += 1
            continue
        start = i
        # whence: ~now or ~(...)
        if c == "~":
            if text.startswith("~now", i):
                toks.append(Token(WHENCE, "~now", start))
                i += 4
            elif i + 1 < n and text[i + 1] == "(":
                j = text.find(")", i)
                if j < 0:
                    raise ScanError("unterminated ~( time literal", i)
                toks.append(Token(WHENCE, text[i : j + 1], start))
                i = j + 1
            else:
                raise ScanError("expected ~now or ~(<timestamp>)", i)
            continue
        # timespan
        if c == "@":
            j = i + 1
            while j < n and text[j].isalpha():
                j += 1
            span = text[i:j]
            if span not in TIMESPANS:
                raise ScanError(f"unknown timespan {span!r}", i)
            toks.append(Token(TIMESPAN, span, start))
            i = j
            continue
        # topic — only in topic-selector position (right after `in`),
        # so `5/9` and `x/y` in expressions scan as division
        if c == "/" and toks and toks[-1].type == KEYWORD and toks[-1].lexeme == "in":
            # grammar: topic = "/" *(ALPHA ...) — the first segment must
            # start with a letter (reference corpus: `all in /12` FAILs)
            if i + 1 < n and text[i + 1].isdigit():
                raise ScanError("topic segments must start with a letter", i)
            j = i + 1
            while j < n and (text[j].isalnum() or text[j] in "/_-"):
                j += 1
            toks.append(Token(TOPIC, text[i:j], start))
            i = j
            continue
        # string literal
        if c in "\"'":
            j = text.find(c, i + 1)
            if j < 0:
                raise ScanError("unterminated string", i)
            toks.append(Token(STRING, text[i + 1 : j], start))
            i = j + 1
            continue
        # number
        if c.isdigit() or (c == "." and i + 1 < n and text[i + 1].isdigit()):
            j = i
            seen_dot = False
            while j < n and (text[j].isdigit() or (text[j] == "." and not seen_dot)):
                if text[j] == ".":
                    seen_dot = True
                j += 1
            lex = text[i:j]
            toks.append(Token(FLOAT if seen_dot else INTEGER, lex, start))
            i = j
            continue
        # identifiers / keywords
        if c.isalpha() or c == "_":
            j = i
            while j < n and (text[j].isalnum() or text[j] == "_"):
                j += 1
            lex = text[i:j]
            toks.append(Token(KEYWORD if lex in KEYWORDS else IDENT, lex, start))
            i = j
            continue
        # multi-char operators
        two = text[i : i + 2]
        if two in ("->", ">=", "<=", "==", "!="):
            toks.append(Token(OP, two, start))
            i += 2
            continue
        if c in ",:|()[]+-*/<>":
            toks.append(Token(OP, c, start))
            i += 1
            continue
        raise ScanError(f"unexpected character {c!r}", i)
    toks.append(Token(EOF, "", n))
    return toks
