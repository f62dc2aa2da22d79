"""Dataclass + YAML + dotted-CLI config engine.

Re-creates the config surface of the reference's pyrallis usage
(reference: scripts/train_latent_paint.py:8-17, src/latent_paint/configs/
train_config.py:86-97) without the pyrallis dependency: nested dataclasses,
a ``--config_path foo.yaml`` file layer, and ``--section.field value``
dotted overrides, with ``__post_init__`` validation.

Unlike the reference (which leaves some attributes un-annotated and therefore
silently non-configurable — see SURVEY.md §2.1), every field here is a real,
typed dataclass field.
"""
from __future__ import annotations

import dataclasses
import sys
import typing
from pathlib import Path
from typing import Any, Dict, List, Optional, Sequence, Tuple, Type, TypeVar, Union

import yaml

T = TypeVar("T")

_NONE_STRINGS = {"none", "null", "~", ""}
_TRUE_STRINGS = {"true", "1", "yes", "on"}
_FALSE_STRINGS = {"false", "0", "no", "off"}


def _is_dataclass_type(tp: Any) -> bool:
    return isinstance(tp, type) and dataclasses.is_dataclass(tp)


def _coerce(value: Any, tp: Any) -> Any:
    """Coerce `value` (string from CLI, or YAML scalar/collection) to type `tp`."""
    origin = typing.get_origin(tp)
    args = typing.get_args(tp)

    # Optional[X] / Union
    if origin is Union:
        non_none = [a for a in args if a is not type(None)]
        if isinstance(value, str) and value.strip().lower() in _NONE_STRINGS:
            return None
        if value is None:
            return None
        for cand in non_none:
            try:
                return _coerce(value, cand)
            except (ValueError, TypeError):
                continue
        raise ValueError(f"cannot coerce {value!r} to {tp}")

    if tp is Any or tp is None or tp is type(None):
        return value

    if origin in (tuple, Tuple):
        items = _split_collection(value)
        if args and args[-1] is not Ellipsis:
            if len(items) != len(args):
                raise ValueError(f"expected {len(args)} items for {tp}, got {items!r}")
            return tuple(_coerce(v, a) for v, a in zip(items, args))
        elem = args[0] if args else Any
        return tuple(_coerce(v, elem) for v in items)

    if origin in (list, List):
        elem = args[0] if args else Any
        return [_coerce(v, elem) for v in _split_collection(value)]

    if origin in (dict, Dict):
        if not isinstance(value, dict):
            raise ValueError(f"expected mapping for {tp}, got {value!r}")
        kt = args[0] if args else Any
        vt = args[1] if args else Any
        return {_coerce(k, kt): _coerce(v, vt) for k, v in value.items()}

    if tp is bool:
        if isinstance(value, bool):
            return value
        if isinstance(value, (int, float)):
            return bool(value)
        s = str(value).strip().lower()
        if s in _TRUE_STRINGS:
            return True
        if s in _FALSE_STRINGS:
            return False
        raise ValueError(f"cannot parse bool from {value!r}")

    if tp is int:
        if isinstance(value, bool):
            return int(value)
        if isinstance(value, int):
            return value
        f = float(str(value))
        if f != int(f):
            raise ValueError(f"non-integral value {value!r} for int field")
        return int(f)

    if tp is float:
        return float(value)

    if tp is str:
        return str(value)

    if tp is Path:
        return Path(str(value))

    if _is_dataclass_type(tp):
        if isinstance(value, tp):
            return value
        if isinstance(value, dict):
            return from_dict(tp, value)
        raise ValueError(f"cannot build {tp} from {value!r}")

    # Fallback: try the constructor.
    return tp(value)


def _split_collection(value: Any) -> Sequence[Any]:
    if isinstance(value, (list, tuple)):
        return value
    if isinstance(value, str):
        s = value.strip()
        if s.startswith("[") and s.endswith("]"):
            s = s[1:-1]
        elif s.startswith("(") and s.endswith(")"):
            s = s[1:-1]
        if not s:
            return []
        return [p.strip() for p in s.split(",")]
    return [value]


def from_dict(cls: Type[T], data: Dict[str, Any]) -> T:
    """Build dataclass `cls` from a (possibly nested) dict, coercing types."""
    if not _is_dataclass_type(cls):
        raise TypeError(f"{cls} is not a dataclass")
    hints = typing.get_type_hints(cls)
    kwargs: Dict[str, Any] = {}
    field_names = {f.name for f in dataclasses.fields(cls)}
    for key, value in (data or {}).items():
        if key not in field_names:
            raise KeyError(f"unknown config key {key!r} for {cls.__name__}; "
                           f"valid keys: {sorted(field_names)}")
        kwargs[key] = _coerce(value, hints[key])
    return cls(**kwargs)


def to_dict(cfg: Any) -> Dict[str, Any]:
    """Recursively convert a dataclass to plain YAML-safe python types."""
    def conv(v: Any) -> Any:
        if dataclasses.is_dataclass(v) and not isinstance(v, type):
            return {f.name: conv(getattr(v, f.name)) for f in dataclasses.fields(v)}
        if isinstance(v, Path):
            return str(v)
        if isinstance(v, tuple):
            return [conv(x) for x in v]
        if isinstance(v, list):
            return [conv(x) for x in v]
        if isinstance(v, dict):
            return {k: conv(x) for k, x in v.items()}
        return v
    return conv(cfg)


def dump_yaml(cfg: Any, path: Union[str, Path]) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(to_dict(cfg), f, sort_keys=False)


def _set_dotted(tree: Dict[str, Any], dotted: str, value: Any) -> None:
    parts = dotted.split(".")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
        if not isinstance(node, dict):
            raise ValueError(f"override {dotted!r} conflicts with scalar {p!r}")
    node[parts[-1]] = value


def _merge(base: Dict[str, Any], extra: Dict[str, Any]) -> Dict[str, Any]:
    out = dict(base)
    for k, v in extra.items():
        if isinstance(v, dict) and isinstance(out.get(k), dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def parse(cls: Type[T], args: Optional[Sequence[str]] = None,
          config_path: Optional[Union[str, Path]] = None) -> T:
    """Parse `cls` from ``--config_path x.yaml`` plus ``--a.b value`` overrides.

    Mirrors the reference CLI surface (README.md:35-45): a YAML base file and
    dotted CLI overrides, CLI winning over YAML.
    """
    argv = list(sys.argv[1:] if args is None else args)
    overrides: Dict[str, Any] = {}
    i = 0
    while i < len(argv):
        tok = argv[i]
        if not tok.startswith("--"):
            raise SystemExit(f"unexpected argument {tok!r}; expected --key value")
        key = tok[2:]
        if "=" in key:
            key, value = key.split("=", 1)
            i += 1
        else:
            if i + 1 >= len(argv):
                raise SystemExit(f"missing value for --{key}")
            value = argv[i + 1]
            i += 2
        if key == "config_path":
            config_path = value
        else:
            _set_dotted(overrides, key, value)

    tree: Dict[str, Any] = {}
    if config_path is not None:
        with open(config_path) as f:
            tree = yaml.safe_load(f) or {}
    tree = _merge(tree, overrides)
    return from_dict(cls, tree)
