"""Recursive-descent SQL parser producing sql.ast nodes.

Single-statement surface like the reference's `parse_sql`
(/root/reference/crates/engine/src/parser.rs:7-12), but with the full
SELECT grammar the reference reaches through DataFusion: joins, grouping,
HAVING, ordering with NULLS FIRST/LAST, LIMIT/OFFSET, CTEs, set ops,
subqueries, CASE/CAST, EXPLAIN, SHOW TABLES, CREATE TABLE AS, DROP TABLE.
"""

from __future__ import annotations

from ..errors import SqlParseError
from . import ast
from .tokenizer import Tok, Token, tokenize


def parse_sql(sql: str):
    """Parse a single SQL statement → AST node."""
    return Parser(tokenize(sql)).parse_statement()


class Parser:
    def __init__(self, tokens: list[Token]):
        self.toks = tokens
        self.pos = 0

    # ---- token helpers ----
    def peek(self, ahead: int = 0) -> Token:
        return self.toks[min(self.pos + ahead, len(self.toks) - 1)]

    def next(self) -> Token:
        t = self.toks[self.pos]
        if t.kind is not Tok.EOF:
            self.pos += 1
        return t

    def err(self, msg: str):
        t = self.peek()
        raise SqlParseError(f"{msg} (got {t.value!r})", t.line, t.col)

    def accept_kw(self, *kws: str) -> bool:
        if self.peek().is_kw(*kws):
            self.next()
            return True
        return False

    def expect_kw(self, *kws: str) -> Token:
        if not self.peek().is_kw(*kws):
            self.err(f"expected {'/'.join(k.upper() for k in kws)}")
        return self.next()

    def accept(self, kind: Tok, value: str | None = None) -> bool:
        t = self.peek()
        if t.kind is kind and (value is None or t.value == value):
            self.next()
            return True
        return False

    def expect(self, kind: Tok, value: str | None = None) -> Token:
        t = self.peek()
        if t.kind is not kind or (value is not None and t.value != value):
            self.err(f"expected {value or kind.value}")
        return self.next()

    def ident(self) -> str:
        t = self.peek()
        if t.kind is Tok.IDENT:
            return self.next().value
        # allow non-reserved keywords as identifiers in name position
        if t.kind is Tok.KEYWORD and t.value in ("first", "last", "tables", "values", "show"):
            return self.next().value
        self.err("expected identifier")

    # ---- statements ----
    def parse_statement(self):
        t = self.peek()
        if t.is_kw("explain"):
            self.next()
            analyze = self.accept_kw("analyze")
            node = ast.Explain(self.parse_query(), analyze=analyze)
        elif t.is_kw("show"):
            self.next()
            self.expect_kw("tables")
            node = ast.ShowTables()
        elif t.is_kw("create"):
            self.next()
            self.expect_kw("table")
            ine = False
            if self.accept_kw("if"):
                self.expect_kw("not")
                self.expect_kw("exists")
                ine = True
            name = self.ident()
            self.expect_kw("as")
            node = ast.CreateTableAs(name, self.parse_query(), if_not_exists=ine)
        elif t.is_kw("drop"):
            self.next()
            self.expect_kw("table")
            ie = False
            if self.accept_kw("if"):
                self.expect_kw("exists")
                ie = True
            node = ast.DropTable(self.ident(), if_exists=ie)
        else:
            node = self.parse_query()
        self.accept(Tok.SEMI)
        if self.peek().kind is not Tok.EOF:
            self.err("unexpected trailing input")
        return node

    # query := [WITH ...] set_expr [ORDER BY ...] [LIMIT n] [OFFSET n]
    def parse_query(self):
        ctes = ()
        if self.accept_kw("with"):
            parts = []
            while True:
                name = self.ident()
                self.expect_kw("as")
                self.expect(Tok.LPAREN)
                sub = self.parse_query()
                self.expect(Tok.RPAREN)
                parts.append((name, sub))
                if not self.accept(Tok.COMMA):
                    break
            ctes = tuple(parts)

        node = self.parse_set_expr()

        order_by = ()
        if self.peek().is_kw("order"):
            self.next()
            self.expect_kw("by")
            order_by = tuple(self.parse_order_items())
        # LIMIT/OFFSET in either order, plus the standard
        # OFFSET n ROWS / FETCH {FIRST|NEXT} n ROWS ONLY spellings
        limit = offset = None
        while True:
            if limit is None and self.accept_kw("limit"):
                limit = self.parse_int_literal()
            elif offset is None and self.accept_kw("offset"):
                offset = self.parse_int_literal()
                self._accept_word("row") or self._accept_word("rows")
            elif limit is None and self._accept_word("fetch"):
                if not (self._accept_word("first")
                        or self._accept_word("next")):
                    self.err("expected FIRST or NEXT after FETCH")
                limit = (self.parse_int_literal()
                         if self.peek().kind is Tok.NUMBER else 1)
                self._accept_word("row") or self._accept_word("rows")
                self._expect_word("only")
            else:
                break

        if isinstance(node, ast.Select):
            if order_by or limit is not None or offset is not None or ctes:
                node = ast.Select(
                    items=node.items, from_=node.from_, where=node.where,
                    group_by=node.group_by, having=node.having,
                    order_by=order_by or node.order_by,
                    limit=limit if limit is not None else node.limit,
                    offset=offset if offset is not None else node.offset,
                    distinct=node.distinct, ctes=ctes or node.ctes,
                    group_sets=node.group_sets,
                )
        else:
            node = ast.SetOp(node.kind, node.left, node.right,
                             order_by=order_by, limit=limit, offset=offset, ctes=ctes)
        return node

    def parse_int_literal(self) -> int:
        t = self.expect(Tok.NUMBER)
        try:
            return int(t.value)
        except ValueError:
            raise SqlParseError("expected integer literal", t.line, t.col)

    def parse_set_expr(self):
        left = self.parse_select_core()
        while self.peek().is_kw("union", "intersect", "except"):
            kw = self.next().value
            if kw == "union":
                kind = ast.SetOpKind.UNION_ALL if self.accept_kw("all") else ast.SetOpKind.UNION
            elif kw == "intersect":
                kind = (ast.SetOpKind.INTERSECT_ALL if self.accept_kw("all")
                        else ast.SetOpKind.INTERSECT)
            else:
                kind = (ast.SetOpKind.EXCEPT_ALL if self.accept_kw("all")
                        else ast.SetOpKind.EXCEPT)
            right = self.parse_select_core()
            left = ast.SetOp(kind, left, right)
        return left

    def parse_select_core(self) -> ast.Select:
        if self.accept(Tok.LPAREN):
            node = self.parse_query()
            self.expect(Tok.RPAREN)
            if not isinstance(node, ast.Select):
                self.err("parenthesized set operations not supported here")
            return node
        self.expect_kw("select")
        distinct = False
        if self.accept_kw("distinct"):
            distinct = True
        elif self.accept_kw("all"):
            pass

        items = []
        while True:
            items.append(self.parse_select_item())
            if not self.accept(Tok.COMMA):
                break

        from_ = None
        if self.accept_kw("from"):
            from_ = self.parse_from()

        where = self.parse_expr() if self.accept_kw("where") else None

        group_by = ()
        group_sets = None
        if self.peek().is_kw("group"):
            self.next()
            self.expect_kw("by")
            elem_sets = [self._parse_group_element()]
            while self.accept(Tok.COMMA):
                elem_sets.append(self._parse_group_element())
            if all(len(es) == 1 for es in elem_sets):
                # plain GROUP BY: each element contributed one set
                group_by = tuple(e for es in elem_sets for e in es[0])
            else:
                # ROLLUP/CUBE/GROUPING SETS: cross-product of element sets
                combined = [()]
                for es in elem_sets:
                    combined = [c + s for c in combined for s in es]
                uniq: list = []
                for s in combined:
                    for e in s:
                        if e not in uniq:
                            uniq.append(e)
                group_by = tuple(uniq)
                group_sets = tuple(
                    tuple(dict.fromkeys(uniq.index(e) for e in s))
                    for s in combined)

        having = self.parse_expr() if self.accept_kw("having") else None

        return ast.Select(items=tuple(items), from_=from_, where=where,
                          group_by=group_by, having=having, distinct=distinct,
                          group_sets=group_sets)

    def _parse_group_element(self) -> list[tuple]:
        """One comma-separated GROUP BY element → the list of grouping
        sets it contributes (a plain expression contributes one
        single-expression set). ROLLUP/CUBE/GROUPING SETS words are
        contextual — still valid column names elsewhere."""
        def expr_list():
            es = [self.parse_expr()]
            while self.accept(Tok.COMMA):
                es.append(self.parse_expr())
            self.expect(Tok.RPAREN)
            return es

        if self._is_word("rollup") and self.peek(1).kind is Tok.LPAREN:
            self.next()
            self.next()
            es = expr_list()
            return [tuple(es[:k]) for k in range(len(es), -1, -1)]
        if self._is_word("cube") and self.peek(1).kind is Tok.LPAREN:
            self.next()
            self.next()
            es = expr_list()
            if len(es) > 8:
                self.err("CUBE supports at most 8 expressions")
            return [tuple(e for i, e in enumerate(es) if (mask >> i) & 1)
                    for mask in range((1 << len(es)) - 1, -1, -1)]
        if (self._is_word("grouping")
                and self.peek(1).kind in (Tok.IDENT, Tok.KEYWORD)
                and self.peek(1).value.lower() == "sets"
                and self.peek(2).kind is Tok.LPAREN):
            self.next()
            self.next()
            self.next()
            sets = []
            while True:
                if self.accept(Tok.LPAREN):
                    if self.peek().kind is Tok.RPAREN:
                        self.next()
                        sets.append(())
                    else:
                        sets.append(tuple(expr_list()))
                else:
                    sets.append((self.parse_expr(),))
                if not self.accept(Tok.COMMA):
                    break
            self.expect(Tok.RPAREN)
            return sets
        return [(self.parse_expr(),)]

    def parse_select_item(self):
        t = self.peek()
        # bare *  or  table.*
        if t.kind is Tok.OP and t.value == "*":
            self.next()
            return ast.SelectItem(ast.Star())
        if (t.kind is Tok.IDENT and self.peek(1).kind is Tok.DOT
                and self.peek(2).kind is Tok.OP and self.peek(2).value == "*"):
            tbl = self.next().value
            self.next(); self.next()
            return ast.SelectItem(ast.Star(table=tbl))
        expr = self.parse_expr()
        alias = None
        if self.accept_kw("as"):
            alias = self.ident()
        elif self.peek().kind is Tok.IDENT:
            alias = self.next().value
        return ast.SelectItem(expr, alias)

    # ---- FROM / joins ----
    def parse_from(self) -> ast.Relation:
        rel = self.parse_table_factor()
        while True:
            t = self.peek()
            if t.is_kw("cross"):
                self.next()
                self.expect_kw("join")
                right = self.parse_table_factor()
                rel = ast.Join(rel, right, ast.JoinKind.CROSS, None)
                continue
            kind = None
            if t.is_kw("join", "inner"):
                if t.is_kw("inner"):
                    self.next()
                self.expect_kw("join")
                kind = ast.JoinKind.INNER
            elif t.is_kw("left", "right", "full"):
                kind = {"left": ast.JoinKind.LEFT, "right": ast.JoinKind.RIGHT,
                        "full": ast.JoinKind.FULL}[self.next().value]
                self.accept_kw("outer")
                self.expect_kw("join")
            elif self.accept(Tok.COMMA):
                right = self.parse_table_factor()
                rel = ast.Join(rel, right, ast.JoinKind.CROSS, None)
                continue
            else:
                break
            right = self.parse_table_factor()
            if self.accept_kw("on"):
                cond = self.parse_expr()
                rel = ast.Join(rel, right, kind, cond)
            elif self.accept_kw("using"):
                self.expect(Tok.LPAREN)
                cols = [self.ident()]
                while self.accept(Tok.COMMA):
                    cols.append(self.ident())
                self.expect(Tok.RPAREN)
                rel = ast.Join(rel, right, kind, None, using=tuple(cols))
            else:
                self.err("expected ON or USING after JOIN")
        return rel

    def parse_table_factor(self) -> ast.Relation:
        if self.accept(Tok.LPAREN):
            if self.accept_kw("values"):
                rows = []
                while True:
                    self.expect(Tok.LPAREN)
                    row = [self.parse_expr()]
                    while self.accept(Tok.COMMA):
                        row.append(self.parse_expr())
                    self.expect(Tok.RPAREN)
                    rows.append(tuple(row))
                    if not self.accept(Tok.COMMA):
                        break
                self.expect(Tok.RPAREN)
                self.accept_kw("as")
                alias = self.ident()
                col_names = ()
                if self.accept(Tok.LPAREN):
                    names = [self.ident()]
                    while self.accept(Tok.COMMA):
                        names.append(self.ident())
                    self.expect(Tok.RPAREN)
                    col_names = tuple(names)
                return ast.ValuesRef(tuple(rows), alias, col_names)
            sub = self.parse_query()
            self.expect(Tok.RPAREN)
            self.accept_kw("as")
            alias = self.ident()
            return ast.SubqueryRef(sub, alias)
        name = self.ident()
        # dotted names (schema.table) — flattened with '.'
        while self.accept(Tok.DOT):
            name += "." + self.ident()
        alias = None
        if self.accept_kw("as"):
            alias = self.ident()
        elif self.peek().kind is Tok.IDENT:
            alias = self.next().value
        return ast.TableRef(name, alias)

    def parse_order_items(self) -> list[ast.OrderItem]:
        out = []
        while True:
            e = self.parse_expr()
            asc = True
            if self.accept_kw("asc"):
                pass
            elif self.accept_kw("desc"):
                asc = False
            nulls_first = None
            if self.accept_kw("nulls"):
                if self.accept_kw("first"):
                    nulls_first = True
                else:
                    self.expect_kw("last")
                    nulls_first = False
            out.append(ast.OrderItem(e, asc, nulls_first))
            if not self.accept(Tok.COMMA):
                break
        return out

    # frame words are contextual, NOT reserved keywords — `rows`, `range`,
    # `row` etc. stay usable as column names everywhere else
    def _is_word(self, *words: str) -> bool:
        t = self.peek()
        return (t.kind in (Tok.IDENT, Tok.KEYWORD)
                and t.value.lower() in words)

    def _accept_word(self, *words: str) -> bool:
        if self._is_word(*words):
            self.next()
            return True
        return False

    def _expect_word(self, word: str) -> None:
        if not self._accept_word(word):
            self.err(f"expected {word.upper()}")

    def parse_frame(self) -> tuple:
        """ROWS|RANGE [BETWEEN <bound> AND <bound> | <bound>]; a lone
        bound means <bound> .. CURRENT ROW (SQL shorthand)."""
        unit = "rows" if self._accept_word("rows") else None
        if unit is None:
            self._expect_word("range")
            unit = "range"

        def bound():
            if self._accept_word("unbounded"):
                if self._accept_word("preceding"):
                    return ("up", 0)
                self._expect_word("following")
                return ("uf", 0)
            if self._accept_word("current"):
                self._expect_word("row")
                return ("c", 0)
            t = self.expect(Tok.NUMBER)
            try:
                n = int(t.value)
            except ValueError:
                self.err("frame offset must be an integer")
            if self._accept_word("preceding"):
                return ("p", n)
            self._expect_word("following")
            return ("f", n)

        if self.accept_kw("between"):
            start = bound()
            self.expect_kw("and")
            end = bound()
        else:
            start = bound()
            end = ("c", 0)
        return (unit, start, end)

    # ---- expressions (precedence climbing) ----
    def parse_expr(self) -> ast.Expr:
        return self.parse_or()

    def parse_or(self) -> ast.Expr:
        left = self.parse_and()
        while self.accept_kw("or"):
            left = ast.BinaryOp(ast.BinOp.OR, left, self.parse_and())
        return left

    def parse_and(self) -> ast.Expr:
        left = self.parse_not()
        while self.accept_kw("and"):
            left = ast.BinaryOp(ast.BinOp.AND, left, self.parse_not())
        return left

    def parse_not(self) -> ast.Expr:
        if self.accept_kw("not"):
            return ast.UnaryOp(ast.UnOp.NOT, self.parse_not())
        return self.parse_comparison()

    _CMP = {"=": ast.BinOp.EQ, "<>": ast.BinOp.NEQ, "<": ast.BinOp.LT,
            "<=": ast.BinOp.LTE, ">": ast.BinOp.GT, ">=": ast.BinOp.GTE}

    def parse_comparison(self) -> ast.Expr:
        left = self.parse_additive()
        t = self.peek()
        if t.kind is Tok.OP and t.value in self._CMP:
            op = self._CMP[self.next().value]
            right = self.parse_additive()
            return ast.BinaryOp(op, left, right)
        if t.is_kw("is"):
            self.next()
            negated = self.accept_kw("not")
            if self.accept_kw("null"):
                return ast.IsNull(left, negated)
            if self.accept_kw("distinct"):
                self.expect_kw("from")
                return ast.IsDistinctFrom(left, self.parse_additive(), negated)
            if self.accept_kw("true"):
                res = ast.BinaryOp(ast.BinOp.EQ, left, ast.Literal(True))
            elif self.accept_kw("false"):
                res = ast.BinaryOp(ast.BinOp.EQ, left, ast.Literal(False))
            else:
                self.err("expected NULL/TRUE/FALSE/DISTINCT FROM after IS")
            return ast.UnaryOp(ast.UnOp.NOT, res) if negated else res
        negated = False
        if t.is_kw("not"):
            nxt = self.peek(1)
            if nxt.is_kw("in", "between", "like", "ilike", "exists"):
                self.next()
                negated = True
                t = self.peek()
        if t.is_kw("between"):
            self.next()
            low = self.parse_additive()
            self.expect_kw("and")
            high = self.parse_additive()
            return ast.Between(left, low, high, negated)
        if t.is_kw("in"):
            self.next()
            self.expect(Tok.LPAREN)
            if self.peek().is_kw("select", "with"):
                sub = self.parse_query()
                self.expect(Tok.RPAREN)
                return ast.InSubquery(left, sub, negated)
            items = [self.parse_expr()]
            while self.accept(Tok.COMMA):
                items.append(self.parse_expr())
            self.expect(Tok.RPAREN)
            return ast.InList(left, tuple(items), negated)
        if t.is_kw("like", "ilike"):
            ci = t.value == "ilike"
            self.next()
            return ast.Like(left, self.parse_additive(), negated, case_insensitive=ci)
        return left

    def parse_additive(self) -> ast.Expr:
        left = self.parse_multiplicative()
        while True:
            t = self.peek()
            if t.kind is Tok.OP and t.value in ("+", "-", "||"):
                op = {"+": ast.BinOp.ADD, "-": ast.BinOp.SUB,
                      "||": ast.BinOp.CONCAT}[self.next().value]
                left = ast.BinaryOp(op, left, self.parse_multiplicative())
            else:
                return left

    def parse_multiplicative(self) -> ast.Expr:
        left = self.parse_unary()
        while True:
            t = self.peek()
            if t.kind is Tok.OP and t.value in ("*", "/", "%"):
                op = {"*": ast.BinOp.MUL, "/": ast.BinOp.DIV,
                      "%": ast.BinOp.MOD}[self.next().value]
                left = ast.BinaryOp(op, left, self.parse_unary())
            else:
                return left

    def parse_unary(self) -> ast.Expr:
        t = self.peek()
        if t.kind is Tok.OP and t.value == "-":
            self.next()
            if self.peek().kind is Tok.NUMBER:
                # fold the sign into the literal (so e.g. split_part's
                # literal-argument contract sees -1 as a literal)
                lit = self.parse_primary()
                assert isinstance(lit, ast.Literal)
                e = ast.Literal(-lit.value)
                while (self.peek().kind is Tok.OP
                       and self.peek().value == "::"):
                    self.next()
                    e = ast.Cast(e, self.parse_type_name())
                return e
            return ast.UnaryOp(ast.UnOp.NEG, self.parse_unary())
        if t.kind is Tok.OP and t.value == "+":
            self.next()
            return self.parse_unary()
        e = self.parse_primary()
        # postfix ::type casts (Postgres spelling), left-associative
        while self.peek().kind is Tok.OP and self.peek().value == "::":
            self.next()
            e = ast.Cast(e, self.parse_type_name())
        return e

    def parse_primary(self) -> ast.Expr:
        t = self.peek()
        if t.kind is Tok.NUMBER:
            self.next()
            if any(c in t.value for c in ".eE"):
                return ast.Literal(float(t.value))
            return ast.Literal(int(t.value))
        if t.kind is Tok.STRING:
            self.next()
            return ast.Literal(t.value)
        if t.is_kw("null"):
            self.next()
            return ast.Literal(None)
        if t.is_kw("true"):
            self.next()
            return ast.Literal(True)
        if t.is_kw("false"):
            self.next()
            return ast.Literal(False)
        if t.is_kw("exists"):
            self.next()
            self.expect(Tok.LPAREN)
            sub = self.parse_query()
            self.expect(Tok.RPAREN)
            return ast.Exists(sub)
        if t.is_kw("cast", "try_cast"):
            safe = t.value == "try_cast"
            self.next()
            self.expect(Tok.LPAREN)
            operand = self.parse_expr()
            self.expect_kw("as")
            type_name = self.parse_type_name()
            self.expect(Tok.RPAREN)
            return ast.Cast(operand, type_name, safe=safe)
        if t.is_kw("case"):
            return self.parse_case()
        if t.kind is Tok.LPAREN:
            self.next()
            if self.peek().is_kw("select", "with"):
                sub = self.parse_query()
                self.expect(Tok.RPAREN)
                return ast.ScalarSubquery(sub)
            e = self.parse_expr()
            self.expect(Tok.RPAREN)
            return e
        if t.kind is Tok.IDENT or t.is_kw("first", "last", "values") or (
                t.is_kw("left", "right") and self.peek(1).kind is Tok.LPAREN):
            name = self.next().value
            low = name.lower()
            # typed literals: DATE '...', TIMESTAMP '...', INTERVAL '...'
            if low in ("date", "timestamp") and self.peek().kind is Tok.STRING:
                s = self.next().value
                return ast.Cast(ast.Literal(s), low)
            if low == "interval" and self.peek().kind is Tok.STRING:
                return self.parse_interval()
            if low == "extract" and self.peek().kind is Tok.LPAREN:
                self.next()
                unit_tok = self.next()
                unit = unit_tok.value.lower()
                if unit not in ("year", "month", "day", "quarter", "hour",
                                "minute", "second", "dow", "doy", "epoch",
                                "week", "isodow"):
                    self.err(f"unknown EXTRACT unit {unit!r}")
                self.expect_kw("from")
                inner = self.parse_expr()
                self.expect(Tok.RPAREN)
                return ast.FunctionCall(unit, (inner,))
            if low == "position" and self.peek().kind is Tok.LPAREN:
                # position(sub IN s) = strpos(s, sub)
                self.next()
                sub = self.parse_additive()
                self.expect_kw("in")
                s = self.parse_expr()
                self.expect(Tok.RPAREN)
                return ast.FunctionCall("strpos", (s, sub))
            # function call
            if self.peek().kind is Tok.LPAREN:
                self.next()
                distinct = False
                args: list = []
                if self.peek().kind is Tok.RPAREN:
                    self.next()
                else:
                    if self.accept_kw("distinct"):
                        distinct = True
                    if self.peek().kind is Tok.OP and self.peek().value == "*":
                        self.next()
                        args = [ast.Star()]
                    else:
                        args = [self.parse_expr()]
                        while self.accept(Tok.COMMA):
                            args.append(self.parse_expr())
                    self.expect(Tok.RPAREN)
                fc = ast.FunctionCall(name.lower(), tuple(args),
                                      distinct=distinct)
                if (fc.name == "date_trunc" and len(fc.args) == 2
                        and isinstance(fc.args[0], ast.Literal)
                        and isinstance(fc.args[0].value, str)):
                    unit = fc.args[0].value.lower()
                    if unit not in ("year", "quarter", "month", "week",
                                    "day", "hour", "minute", "second"):
                        self.err(f"unknown date_trunc unit {unit!r}")
                    fc = ast.FunctionCall(f"date_trunc_{unit}",
                                          (fc.args[1],))
                if self._is_word("filter") and self.peek(1).kind is Tok.LPAREN:
                    # agg(x) FILTER (WHERE c) ≡ agg(CASE WHEN c THEN x END)
                    # for the null-ignoring aggregates (all of ours)
                    self.next()
                    self.next()
                    self.expect_kw("where")
                    cond = self.parse_expr()
                    self.expect(Tok.RPAREN)
                    wrapped = []
                    for i, a in enumerate(fc.args):
                        if i == 0:
                            if isinstance(a, ast.Star):
                                a = ast.Literal(1)
                            wrapped.append(ast.Case(None, ((cond, a),), None))
                        else:
                            wrapped.append(a)
                    if not wrapped:
                        wrapped = [ast.Case(None, ((cond, ast.Literal(1)),),
                                            None)]
                    fc = ast.FunctionCall(fc.name, tuple(wrapped),
                                          distinct=fc.distinct)
                if self.peek().is_kw("over"):
                    self.next()
                    self.expect(Tok.LPAREN)
                    partition_by: list = []
                    order_by: list = []
                    if self.accept_kw("partition"):
                        self.expect_kw("by")
                        partition_by.append(self.parse_expr())
                        while self.accept(Tok.COMMA):
                            partition_by.append(self.parse_expr())
                    if self.peek().is_kw("order"):
                        self.next()
                        self.expect_kw("by")
                        order_by = self.parse_order_items()
                    frame = None
                    if self._is_word("rows", "range"):
                        frame = self.parse_frame()
                    self.expect(Tok.RPAREN)
                    return ast.WindowCall(fc.name, fc.args,
                                          tuple(partition_by),
                                          tuple(order_by), frame)
                return fc
            # qualified column
            if self.peek().kind is Tok.DOT:
                self.next()
                col = self.ident()
                return ast.ColumnRef(col, table=name)
            return ast.ColumnRef(name)
        self.err("expected expression")

    _INTERVAL_UNITS = {
        "year": (12, 0, 0), "years": (12, 0, 0),
        "month": (1, 0, 0), "months": (1, 0, 0),
        "week": (0, 7, 0), "weeks": (0, 7, 0),
        "day": (0, 1, 0), "days": (0, 1, 0),
        "hour": (0, 0, 3_600_000_000), "hours": (0, 0, 3_600_000_000),
        "minute": (0, 0, 60_000_000), "minutes": (0, 0, 60_000_000),
        "second": (0, 0, 1_000_000), "seconds": (0, 0, 1_000_000),
    }

    def parse_interval(self) -> ast.Expr:
        body = self.next().value.strip()       # the quoted part
        parts = body.split()
        unit = None
        if (self.peek().kind is Tok.IDENT
                and self.peek().value.lower() in self._INTERVAL_UNITS):
            unit = self.next().value.lower()
        if unit is not None:
            qty_str, rest = body, []
        elif len(parts) >= 2 and parts[1].lower() in self._INTERVAL_UNITS:
            qty_str, unit = parts[0], parts[1].lower()
        else:
            self.err("INTERVAL needs a unit (e.g. INTERVAL '1' YEAR)")
        try:
            qty = int(qty_str)
        except ValueError:
            self.err(f"invalid interval quantity {qty_str!r}")
        m, d, us = self._INTERVAL_UNITS[unit]
        return ast.IntervalLiteral(months=qty * m, days=qty * d,
                                   micros=qty * us)

    def parse_type_name(self) -> str:
        parts = [self.next().value]
        # e.g. DOUBLE PRECISION / BIGINT / VARCHAR(10)
        while self.peek().kind is Tok.IDENT and self.peek().value.lower() == "precision":
            parts.append(self.next().value)
        if self.accept(Tok.LPAREN):
            while not self.accept(Tok.RPAREN):
                self.next()
        return " ".join(p.lower() for p in parts)

    def parse_case(self) -> ast.Expr:
        self.expect_kw("case")
        operand = None
        if not self.peek().is_kw("when"):
            operand = self.parse_expr()
        whens = []
        while self.accept_kw("when"):
            cond = self.parse_expr()
            self.expect_kw("then")
            whens.append((cond, self.parse_expr()))
        else_ = self.parse_expr() if self.accept_kw("else") else None
        self.expect_kw("end")
        if not whens:
            self.err("CASE requires at least one WHEN")
        return ast.Case(operand, tuple(whens), else_)
