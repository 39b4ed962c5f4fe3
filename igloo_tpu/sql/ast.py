"""SQL abstract syntax tree.

Node coverage mirrors what the reference engine can execute through its
DataFusion path (SELECT/WHERE/JOIN/GROUP BY/ORDER BY/LIMIT, scalar +
aggregate functions, UDFs — see SURVEY.md §2.1) plus EXPLAIN and simple
set operations.
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional


# --------------------------------------------------------------------------
# Expressions
# --------------------------------------------------------------------------

class Expr:
    pass


@dataclasses.dataclass(frozen=True)
class Literal(Expr):
    value: object           # python int/float/str/bool/None
    def __repr__(self): return f"Lit({self.value!r})"


@dataclasses.dataclass(frozen=True)
class ColumnRef(Expr):
    name: str
    table: Optional[str] = None
    def __repr__(self):
        return f"Col({self.table + '.' if self.table else ''}{self.name})"


@dataclasses.dataclass(frozen=True)
class Star(Expr):
    table: Optional[str] = None


class BinOp(enum.Enum):
    ADD = "+"; SUB = "-"; MUL = "*"; DIV = "/"; MOD = "%"
    EQ = "="; NEQ = "<>"; LT = "<"; LTE = "<="; GT = ">"; GTE = ">="
    AND = "AND"; OR = "OR"
    CONCAT = "||"


@dataclasses.dataclass(frozen=True)
class BinaryOp(Expr):
    op: BinOp
    left: Expr
    right: Expr
    def __repr__(self): return f"({self.left!r} {self.op.value} {self.right!r})"


class UnOp(enum.Enum):
    NEG = "-"; NOT = "NOT"; POS = "+"


@dataclasses.dataclass(frozen=True)
class UnaryOp(Expr):
    op: UnOp
    operand: Expr


@dataclasses.dataclass(frozen=True)
class IsNull(Expr):
    operand: Expr
    negated: bool = False


@dataclasses.dataclass(frozen=True)
class IsDistinctFrom(Expr):
    left: Expr
    right: Expr
    negated: bool = False


@dataclasses.dataclass(frozen=True)
class Between(Expr):
    operand: Expr
    low: Expr
    high: Expr
    negated: bool = False


@dataclasses.dataclass(frozen=True)
class InList(Expr):
    operand: Expr
    items: tuple
    negated: bool = False


@dataclasses.dataclass(frozen=True)
class Like(Expr):
    operand: Expr
    pattern: Expr
    negated: bool = False
    case_insensitive: bool = False  # ILIKE


@dataclasses.dataclass(frozen=True)
class FunctionCall(Expr):
    name: str               # lower-cased
    args: tuple
    distinct: bool = False  # COUNT(DISTINCT x)
    def __repr__(self):
        d = "DISTINCT " if self.distinct else ""
        return f"{self.name}({d}{', '.join(map(repr, self.args))})"


@dataclasses.dataclass(frozen=True)
class Cast(Expr):
    operand: Expr
    type_name: str          # raw SQL type name, resolved at bind time
    safe: bool = False      # TRY_CAST


@dataclasses.dataclass(frozen=True)
class Case(Expr):
    operand: Optional[Expr]             # CASE x WHEN ... vs CASE WHEN ...
    whens: tuple                        # ((cond_or_value, result), ...)
    else_: Optional[Expr]


@dataclasses.dataclass(frozen=True)
class IntervalLiteral(Expr):
    months: int = 0
    days: int = 0
    micros: int = 0


@dataclasses.dataclass(frozen=True)
class WindowCall(Expr):
    func: str                   # lower-cased window/aggregate function
    args: tuple
    partition_by: tuple = ()
    order_by: tuple = ()        # (OrderItem, ...)
    # frame: None = SQL default, else (unit, start, end) with
    # unit in {"rows","range"} and each bound a (kind, n) pair,
    # kind in {"up","p","c","f","uf"} (unbounded-preceding, n-preceding,
    # current-row, n-following, unbounded-following), n an int (0 unless
    # kind is "p"/"f").
    frame: tuple | None = None

    def __repr__(self):
        return f"{self.func}(...) OVER(...)"


@dataclasses.dataclass(frozen=True)
class ScalarSubquery(Expr):
    query: "Select"


@dataclasses.dataclass(frozen=True)
class Exists(Expr):
    query: "Select"
    negated: bool = False


@dataclasses.dataclass(frozen=True)
class InSubquery(Expr):
    operand: Expr
    query: "Select"
    negated: bool = False


# --------------------------------------------------------------------------
# Relations / statements
# --------------------------------------------------------------------------

class Relation:
    pass


@dataclasses.dataclass(frozen=True)
class TableRef(Relation):
    name: str
    alias: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class SubqueryRef(Relation):
    query: "Select"
    alias: str


@dataclasses.dataclass(frozen=True)
class ValuesRef(Relation):
    rows: tuple                 # tuple of tuples of Expr (literals)
    alias: str
    col_names: tuple = ()


class JoinKind(enum.Enum):
    INNER = "INNER"
    LEFT = "LEFT"
    RIGHT = "RIGHT"
    FULL = "FULL"
    CROSS = "CROSS"
    # internal kinds produced by the binder for IN/EXISTS subqueries
    SEMI = "SEMI"
    ANTI = "ANTI"


@dataclasses.dataclass(frozen=True)
class Join(Relation):
    left: Relation
    right: Relation
    kind: JoinKind
    condition: Optional[Expr]       # ON expr; None for CROSS
    using: tuple = ()               # USING (c1, c2)


@dataclasses.dataclass(frozen=True)
class OrderItem:
    expr: Expr
    ascending: bool = True
    nulls_first: Optional[bool] = None  # None → engine default (Postgres rule)


@dataclasses.dataclass(frozen=True)
class SelectItem:
    expr: Expr
    alias: Optional[str] = None


@dataclasses.dataclass(frozen=True)
class Select:
    items: tuple                    # (SelectItem | Star, ...)
    from_: Optional[Relation] = None
    where: Optional[Expr] = None
    group_by: tuple = ()
    having: Optional[Expr] = None
    order_by: tuple = ()            # (OrderItem, ...)
    limit: Optional[int] = None
    offset: Optional[int] = None
    distinct: bool = False
    ctes: tuple = ()                # ((name, Select), ...)
    # ROLLUP/CUBE/GROUPING SETS: index tuples into group_by, one per
    # grouping set; None = plain GROUP BY
    group_sets: Optional[tuple] = None


class SetOpKind(enum.Enum):
    UNION = "UNION"
    UNION_ALL = "UNION ALL"
    INTERSECT = "INTERSECT"
    INTERSECT_ALL = "INTERSECT ALL"
    EXCEPT = "EXCEPT"
    EXCEPT_ALL = "EXCEPT ALL"


@dataclasses.dataclass(frozen=True)
class SetOp:
    kind: SetOpKind
    left: object                    # Select | SetOp
    right: object
    order_by: tuple = ()
    limit: Optional[int] = None
    offset: Optional[int] = None
    ctes: tuple = ()


@dataclasses.dataclass(frozen=True)
class Explain:
    query: object
    analyze: bool = False


@dataclasses.dataclass(frozen=True)
class ShowTables:
    pass


@dataclasses.dataclass(frozen=True)
class CreateTableAs:
    name: str
    query: object
    if_not_exists: bool = False


@dataclasses.dataclass(frozen=True)
class DropTable:
    name: str
    if_exists: bool = False
