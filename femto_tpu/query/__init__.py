from .ast import (
    ApproxSettings,
    QAnd,
    QNot,
    QOr,
    QTerm,
    QThen,
    QWithin,
    RAlt,
    RChar,
    RRep,
    RSeq,
    RStr,
)
from .parser import parse_query, ParseError
from .nfa import NFA, compile_nfa
from .results import Results, ResultType
from .engine import execute, count_query, docs_query
