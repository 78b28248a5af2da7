"""Trace candidate selection for a fixture (current sieve API).

Usage: python scripts/trace_fixture.py <fixture_id> [flags_int]
"""

from __future__ import annotations

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from readability_ex_spark.kernel import cleaner, dom, index, metadata, sieve, title  # noqa: E402
from readability_ex_spark.kernel import conformance as C  # noqa: E402
from readability_ex_spark.kernel.constants import FLAG_ALL  # noqa: E402
from readability_ex_spark.kernel.dom import Element  # noqa: E402


def main() -> int:
    fid = sys.argv[1]
    flags = int(sys.argv[2]) if len(sys.argv) > 2 else FLAG_ALL
    fix = C.load_fixture(fid)
    doc = dom.parse_document(fix["source"])
    doc = cleaner.unwrap_noscript_images(doc)
    doc = cleaner.remove_scripts(doc)
    doc = cleaner.prep_document(doc)
    meta = metadata.extract(doc, fix["source"])
    t = title.get_article_title(doc, meta)
    print(f"title={t!r} meta_byline={meta.get('byline')!r}")

    roots = [c.copy_deep() if isinstance(c, Element) else c for c in doc]
    walker = sieve._GrabWalk(flags, t, meta)
    roots = walker.walk_list(roots, [])
    print(f"walk byline={walker.byline!r}")
    nodes2, el_ids2 = index.build(roots)
    ps2 = sieve.PassState(nodes2, el_ids2)
    sieve._score_candidates(ps2, flags)
    # replicate pick without promotions for display
    for nid in ps2.is_candidate:
        ps2.score[nid] = ps2.score[nid] * (1.0 - ps2.nodes[nid].link_density)
    ranked = sorted(ps2.is_candidate, key=lambda i: (-ps2.score[i], i))[:8]
    for nid in ranked:
        n = nodes2[nid]
        print(
            f"  cand id={nid} tag={n.tag} id={n.id_attr!r} cls={n.class_!r} "
            f"score={ps2.score[nid]:.2f} ld={n.link_density:.3f} "
            f"len={len(n.norm_text)}"
        )
    # full pick with promotions
    ps3 = sieve.PassState(nodes2, el_ids2)
    sieve._score_candidates(ps3, flags)
    top = sieve._pick_top_candidate(ps3, {"nb_top_candidates": 5}, flags)
    n = nodes2[top]
    print(f"top after promotions: tag={n.tag} id={n.id_attr!r} cls={n.class_!r}")
    cur = n.parent_id
    while cur is not None:
        a = nodes2[cur]
        print(f"  anc tag={a.tag} id={a.id_attr!r} cls={a.class_!r} "
              f"children={len(a.child_ids)} score={ps3.score.get(cur, 0):.2f}")
        cur = a.parent_id
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
