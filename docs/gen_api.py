"""Generate the API reference (docs/api/*.md) from docstrings.

The reference ships a Doxygen -> Exhale -> Breathe -> Sphinx site built
from its header comments (/root/reference/README.md:36-45,
docs/conf.py:19-24). This environment has no sphinx/mkdocs, so the
equivalent capability is a dependency-free generator: it imports every
module of `cutrace_tpu`, walks its public surface with `inspect`, and
writes one markdown page per module plus an index. Regenerate with

    python docs/gen_api.py

(from the repo root; forces the CPU backend so no TPU is needed).
"""

from __future__ import annotations

import importlib
import inspect
import pkgutil
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
OUT = ROOT / "docs" / "api"


def _setup_backend():
    sys.path.insert(0, str(ROOT))
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass


def _doc(obj) -> str:
    d = inspect.getdoc(obj)
    return d.strip() if d else ""


def _signature(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(...)"


def _is_public(name: str) -> bool:
    return not name.startswith("_")


def _anchor(text: str) -> str:
    return text.lower().replace(" ", "-").replace(".", "").replace("(", "").replace(")", "")


def _document_function(fn, name: str, depth: int = 3) -> list[str]:
    lines = [f"{'#' * depth} `{name}{_signature(fn)}`", ""]
    doc = _doc(fn)
    if doc:
        lines += [doc, ""]
    return lines


def _document_class(cls, name: str) -> list[str]:
    lines = [f"### class `{name}`", ""]
    doc = _doc(cls)
    if doc:
        lines += [doc, ""]
    # dataclass fields
    fields = getattr(cls, "__dataclass_fields__", None)
    if fields:
        lines += ["**Fields:**", ""]
        for fname, f in fields.items():
            ann = getattr(f.type, "__name__", None) or str(f.type)
            lines.append(f"- `{fname}`: `{ann}`")
        lines.append("")
    for mname, member in inspect.getmembers(cls):
        if not _is_public(mname):
            continue
        if inspect.isfunction(member) and member.__qualname__.startswith(
            cls.__name__ + "."
        ):
            lines += _document_function(member, f"{name}.{mname}", depth=4)
        elif isinstance(
            inspect.getattr_static(cls, mname, None), property
        ):
            pdoc = _doc(member)
            lines += [f"#### property `{name}.{mname}`", ""]
            if pdoc:
                lines += [pdoc, ""]
    return lines


def document_module(modname: str) -> str:
    mod = importlib.import_module(modname)
    lines = [f"# `{modname}`", ""]
    doc = _doc(mod)
    if doc:
        lines += [doc, ""]

    classes, functions = [], []
    for name, obj in inspect.getmembers(mod):
        if not _is_public(name):
            continue
        if getattr(obj, "__module__", None) != modname:
            continue  # re-exports documented at their home module
        if inspect.isclass(obj):
            classes.append((name, obj))
        elif inspect.isfunction(obj):
            functions.append((name, obj))

    if classes:
        lines += ["## Classes", ""]
        for name, obj in classes:
            lines += _document_class(obj, name)
    if functions:
        lines += ["## Functions", ""]
        for name, obj in functions:
            lines += _document_function(obj, name)
    return "\n".join(lines).rstrip() + "\n"


def main() -> None:
    _setup_backend()
    import cutrace_tpu

    OUT.mkdir(parents=True, exist_ok=True)
    modules = ["cutrace_tpu"]
    for info in pkgutil.walk_packages(
        cutrace_tpu.__path__, prefix="cutrace_tpu."
    ):
        if "__main__" in info.name:
            continue  # importing it would run the CLI
        modules.append(info.name)

    index = [
        "# cutrace_tpu API reference",
        "",
        "Generated from docstrings by `docs/gen_api.py` "
        "(the TPU-native analog of the reference's Doxygen/Sphinx site, "
        "/root/reference/README.md:36-45). One page per module:",
        "",
    ]
    for modname in sorted(modules):
        page = modname.replace(".", "_") + ".md"
        try:
            text = document_module(modname)
        except Exception as e:  # pragma: no cover - import guard
            print(f"skip {modname}: {e}", file=sys.stderr)
            continue
        (OUT / page).write_text(text)
        mod = importlib.import_module(modname)
        first = (_doc(mod).splitlines() or [""])[0]
        index.append(f"- [`{modname}`]({page}) — {first}")
    index.append("")
    (OUT / "index.md").write_text("\n".join(index))
    print(f"wrote {len(modules)} module pages to {OUT}")


if __name__ == "__main__":
    main()
