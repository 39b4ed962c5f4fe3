"""SQL tokenizer (GenericDialect-compatible surface, see reference
/root/reference/crates/engine/src/parser.rs:7-12 which uses sqlparser-rs
GenericDialect)."""

from __future__ import annotations

import dataclasses
import enum

from ..errors import SqlParseError


class Tok(enum.Enum):
    KEYWORD = "kw"
    IDENT = "ident"
    NUMBER = "num"
    STRING = "str"
    OP = "op"
    LPAREN = "("
    RPAREN = ")"
    COMMA = ","
    DOT = "."
    SEMI = ";"
    EOF = "eof"


KEYWORDS = {
    "select", "from", "where", "group", "by", "having", "order", "limit",
    "offset", "as", "and", "or", "not", "null", "is", "in", "between",
    "like", "ilike", "case", "when", "then", "else", "end", "cast",
    "try_cast", "join", "inner", "left", "right", "full", "outer", "cross",
    "on", "using", "union", "all", "intersect", "except", "distinct",
    "asc", "desc", "nulls", "first", "last", "true", "false", "with",
    "exists", "explain", "analyze", "show", "tables", "create", "table",
    "over", "partition",
    "drop", "if", "values",
}

_TWO_CHAR_OPS = {"<=", ">=", "<>", "!=", "||", "::"}
_ONE_CHAR_OPS = set("+-*/%<>=")


@dataclasses.dataclass
class Token:
    kind: Tok
    value: str
    line: int
    col: int

    def is_kw(self, *kws: str) -> bool:
        return self.kind is Tok.KEYWORD and self.value in kws


def tokenize(sql: str) -> list[Token]:
    toks: list[Token] = []
    i, line, col = 0, 1, 1
    n = len(sql)

    def err(msg):
        raise SqlParseError(msg, line, col)

    while i < n:
        c = sql[i]
        if c in " \t\r":
            i += 1; col += 1
            continue
        if c == "\n":
            i += 1; line += 1; col = 1
            continue
        if sql.startswith("--", i):
            while i < n and sql[i] != "\n":
                i += 1
            continue
        if sql.startswith("/*", i):
            end = sql.find("*/", i + 2)
            if end < 0:
                err("unterminated block comment")
            seg = sql[i:end + 2]
            line += seg.count("\n")
            i = end + 2
            continue
        start_line, start_col = line, col
        if c == "'":  # string literal, '' escapes a quote
            j = i + 1
            buf = []
            while True:
                if j >= n:
                    err("unterminated string literal")
                if sql[j] == "'":
                    if j + 1 < n and sql[j + 1] == "'":
                        buf.append("'")
                        j += 2
                        continue
                    break
                buf.append(sql[j])
                j += 1
            toks.append(Token(Tok.STRING, "".join(buf), start_line, start_col))
            col += j + 1 - i
            i = j + 1
            continue
        if c == '"':  # quoted identifier
            j = sql.find('"', i + 1)
            if j < 0:
                err("unterminated quoted identifier")
            toks.append(Token(Tok.IDENT, sql[i + 1:j], start_line, start_col))
            col += j + 1 - i
            i = j + 1
            continue
        if c.isdigit() or (c == "." and i + 1 < n and sql[i + 1].isdigit()):
            j = i
            seen_dot = seen_exp = False
            while j < n:
                ch = sql[j]
                if ch.isdigit():
                    j += 1
                elif ch == "." and not seen_dot and not seen_exp:
                    seen_dot = True; j += 1
                elif ch in "eE" and not seen_exp and j > i:
                    if j + 1 < n and (sql[j + 1].isdigit() or sql[j + 1] in "+-"):
                        seen_exp = True; j += 2
                    else:
                        break
                else:
                    break
            toks.append(Token(Tok.NUMBER, sql[i:j], start_line, start_col))
            col += j - i
            i = j
            continue
        if c.isalpha() or c == "_":
            j = i
            while j < n and (sql[j].isalnum() or sql[j] == "_"):
                j += 1
            word = sql[i:j]
            low = word.lower()
            if low in KEYWORDS:
                toks.append(Token(Tok.KEYWORD, low, start_line, start_col))
            else:
                toks.append(Token(Tok.IDENT, word, start_line, start_col))
            col += j - i
            i = j
            continue
        two = sql[i:i + 2]
        if two in _TWO_CHAR_OPS:
            toks.append(Token(Tok.OP, "<>" if two == "!=" else two, start_line, start_col))
            i += 2; col += 2
            continue
        if c in _ONE_CHAR_OPS:
            toks.append(Token(Tok.OP, c, start_line, start_col))
            i += 1; col += 1
            continue
        simple = {"(": Tok.LPAREN, ")": Tok.RPAREN, ",": Tok.COMMA,
                  ".": Tok.DOT, ";": Tok.SEMI}
        if c in simple:
            toks.append(Token(simple[c], c, start_line, start_col))
            i += 1; col += 1
            continue
        err(f"unexpected character {c!r}")
    toks.append(Token(Tok.EOF, "", line, col))
    return toks
