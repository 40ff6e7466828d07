from .joins import OnClause, as_of_join, join
from .qualifiers import PandasPredicate, Predicate, Qualifier, StopWhen
from .transformers import (
    Apply,
    Drop,
    Keep,
    MapFields,
    NoOp,
    PandasMap,
    Rename,
    Replace,
    ReplaceRecursive,
    Transformer,
    WithColumns,
)

__all__ = [
    "OnClause",
    "join",
    "as_of_join",
    "Qualifier",
    "Predicate",
    "PandasPredicate",
    "StopWhen",
    "Transformer",
    "NoOp",
    "Rename",
    "Drop",
    "Keep",
    "Replace",
    "ReplaceRecursive",
    "MapFields",
    "WithColumns",
    "Apply",
    "PandasMap",
]
