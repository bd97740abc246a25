"""Deterministic synthetic web: url -> page spec -> HTML.

Every page is a pure function of its URL, so executor-side "fetch"
(mapInPandas) of any URL returns identical content on any node, any
round, any resume — the property that makes crawl-order and URL-seen
parity testable without a network (no external data, per the brief).

Page shapes mirror the reference's fixtures: article body with
paragraphs and in-article links, <figure><img><figcaption>, lazy
data-src images, wrapper-div captions, og/twitter meta, JSON-LD
NewsArticle, a <table> with thead, a <dl>, and boilerplate
nav/footer/newsletter blocks (/root/reference/tests/fixtures/*,
/root/reference/tests/parseArticle.test.js:410-454).

Link-target distribution is intentionally skewed: host 0 receives a
disproportionate share of cross-host links (a "hot host"), exercising
the politeness-budget + salting path of the scheduler (north rule).
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from .images import caption_for, image_id_for

N_HOSTS_DEFAULT = 50
VOCAB = (
    "government economy election minister report climate energy market "
    "health science research data policy council budget transport city "
    "school hospital court police union strike protest summit treaty "
    "company profit shares investor startup technology software network "
    "river mountain coast storm rainfall harvest wildlife forest"
).split()
_SLUGS = [
    "city-council-vote", "market-report", "storm-warning", "tech-launch",
    "health-study", "budget-plan", "court-ruling", "energy-deal",
    "school-reform", "transport-strike", "climate-summit", "river-survey",
]


def stable_hash(s: str) -> int:
    """64-bit deterministic hash of a string (blake2b, platform-stable)."""
    return struct.unpack("<Q", hashlib.blake2b(s.encode("utf-8"), digest_size=8).digest())[0]


def host_name(k: int) -> str:
    return f"host{k}.example"


def article_url(host_k: int, aid: int) -> str:
    mm = (aid % 12) + 1
    slug = _SLUGS[aid % len(_SLUGS)]
    return f"https://{host_name(host_k)}/2024/{mm:02d}/{slug}-{aid}"


def parse_article_url(url: str) -> tuple[int, int] | None:
    """Inverse of article_url; None if not a synthetic article URL."""
    try:
        rest = url.split("://", 1)[1]
        host, _, path = rest.partition("/")
        if not host.startswith("host") or not host.endswith(".example"):
            return None
        k = int(host[4:].split(".")[0])
        aid = int(path.rsplit("-", 1)[1])
        return (k, aid)
    except (IndexError, ValueError):
        return None


def _rng_for(url: str) -> np.random.RandomState:
    return np.random.RandomState(stable_hash(url) % (2**31 - 1))


def page_spec(url: str, n_hosts: int = N_HOSTS_DEFAULT, scale: int = 1) -> dict:
    """Deterministic page spec with ground-truth extraction fields.

    `scale` multiplies content volume (paragraphs ×scale, links ×up to
    4) to approximate real article pages (30-100 KB) for throughput
    benchmarking; scale=1 (default) keeps the original small fixtures
    that every parity test pins."""
    parsed = parse_article_url(url)
    h = stable_hash(url)
    if parsed is None or h % 50 == 7:
        return {"url": url, "status": 404, "html": "<html><body>not found</body></html>"}
    if h % 50 == 13:
        return {"url": url, "status": 403, "html": "<html><body>forbidden</body></html>"}

    host_k, aid = parsed
    rng = _rng_for(url)
    slug = _SLUGS[aid % len(_SLUGS)]
    title_words = [w.capitalize() for w in rng.choice(VOCAB, size=4, replace=False)]
    title = " ".join(title_words)
    site = f"Host{host_k} News"

    n_paras = int(3 + rng.randint(0, 6)) * max(1, scale)
    paragraphs = [
        " ".join(rng.choice(VOCAB, size=int(18 + rng.randint(0, 25)))).capitalize() + "."
        for _ in range(n_paras)
    ]

    # --- out-links (DOM order), mixed relative/absolute + junk ---
    n_links = int(4 + rng.randint(0, 7)) * min(max(1, scale), 4)
    links: list[dict] = []
    for j in range(n_links):
        r = rng.randint(0, 100)
        if r < 55:  # same-host article, relative href
            target_aid = int(rng.randint(0, 5000))
            t_url = article_url(host_k, target_aid)
            href = t_url.split(host_name(host_k), 1)[1]  # path-only (relative)
        elif r < 85:  # cross-host, skewed toward hot host 0
            target_host = 0 if rng.randint(0, 100) < 40 else int(rng.randint(0, n_hosts))
            t_url = article_url(target_host, int(rng.randint(0, 5000)))
            href = t_url
        elif r < 90:  # duplicate of the first link (dedup fodder)
            href = links[0]["href"] if links else "/2024/01/market-report-1"
        elif r < 94:
            href = f"/files/report-{int(rng.randint(0, 99))}.pdf"  # skipUrl fodder
        elif r < 97:
            href = f"https://{host_name(host_k)}/live/blog-{int(rng.randint(0, 99))}"
        else:
            href = "mailto:tips@example.com"
        links.append({"href": href, "text": f"Read more {j}"})

    # --- images: 1-3 figure images + 1 lazy + 1 wrapper-caption ---
    img_base = int(h % 100_000)
    n_figs = int(1 + rng.randint(0, 3))
    images = []
    for j in range(n_figs):
        idx = (img_base + j * 17) % 100_000
        images.append(
            {
                "kind": "figure",
                "image_id": image_id_for(idx),
                "src": f"/media/{image_id_for(idx)}.png",
                "alt": f"photo {idx}",
                "caption": caption_for(idx),
            }
        )
    lazy_idx = (img_base + 991) % 100_000
    images.append(
        {
            "kind": "lazy",
            "image_id": image_id_for(lazy_idx),
            "src": None,
            "data_src": f"https://cdn.{host_name(host_k)}/media/{image_id_for(lazy_idx)}.png",
            "alt": f"photo {lazy_idx}",
            "caption": None,
        }
    )
    wrap_idx = (img_base + 1423) % 100_000
    images.append(
        {
            "kind": "wrapper",
            "image_id": image_id_for(wrap_idx),
            "src": f"/media/{image_id_for(wrap_idx)}.png",
            "alt": f"photo {wrap_idx}",
            "caption": caption_for(wrap_idx),
        }
    )

    meta = {
        "description": f"{title} — coverage from {site}.",
        "og:title": title,
        "og:type": "article",
        "twitter:title": title,
        "author": f"Reporter {int(h % 97)}",
    }
    return {
        "url": url,
        "status": 200,
        "host_k": host_k,
        "aid": aid,
        "slug": slug,
        "title": title,
        "site": site,
        "paragraphs": paragraphs,
        "links": links,
        "images": images,
        "meta": meta,
        "headline": title,
    }


def render_html(spec: dict) -> str:
    """Render a spec to HTML (only called for status==200 specs)."""
    if spec["status"] != 200:
        return spec["html"]
    title, site = spec["title"], spec["site"]
    meta_tags = "\n".join(
        (
            f'<meta property="{k}" content="{v}">'
            if k.startswith("og:")
            else f'<meta name="{k}" content="{v}">'
        )
        for k, v in spec["meta"].items()
    )
    body_text = " ".join(spec["paragraphs"])
    jsonld = (
        '{"@context":"https://schema.org","@type":"NewsArticle",'
        f'"headline":"{spec["headline"]}","articleBody":"{body_text[:200]}"}}'
    )
    paras = "\n".join(f"<p>{p}</p>" for p in spec["paragraphs"])
    links_html = "\n".join(
        f'<p><a href="{l["href"]}">{l["text"]}</a></p>' for l in spec["links"]
    )
    imgs = []
    for im in spec["images"]:
        if im["kind"] == "figure":
            imgs.append(
                f'<figure><img src="{im["src"]}" alt="{im["alt"]}">'
                f"<figcaption>{im['caption']}</figcaption></figure>"
            )
        elif im["kind"] == "lazy":
            # own wrapper div: no caption-bearing siblings/parents,
            # so the ground-truth caption is None (real lazy images
            # are nested inside their own media containers)
            imgs.append(
                f'<div class="media"><img class="lazyload" '
                f'data-src="{im["data_src"]}" alt="{im["alt"]}"></div>'
            )
        else:
            imgs.append(
                f'<div class="image-wrapper"><img src="{im["src"]}" alt="{im["alt"]}">'
                f'<p class="caption">{im["caption"]}</p></div>'
            )
    imgs_html = "\n".join(imgs)
    return f"""<!DOCTYPE html>
<html><head>
<title>{title} | {site}</title>
{meta_tags}
<script type="application/ld+json">{jsonld}</script>
</head><body>
<nav><a href="/">Home</a><a href="/news">News</a></nav>
<article>
<h1>{title}</h1>
{paras}
{imgs_html}
{links_html}
<table><thead><tr><th>Region</th><th>Value</th></tr></thead>
<tbody><tr><td>North</td><td>{spec["aid"] % 100}</td></tr>
<tr><td>South</td><td>{(spec["aid"] * 7) % 100}</td></tr></tbody></table>
<dl><dt>Topic</dt><dd>{spec["slug"]}</dd><dt>Site</dt><dd>{site}</dd></dl>
</article>
<div class="newsletter-signup"><p>Sign up for our newsletter!</p>
<a href="/subscribe">Subscribe</a></div>
<footer><p>© 2024 {site}</p><a href="/about">About</a></footer>
</body></html>"""


def fetch_page(url: str, n_hosts: int = N_HOSTS_DEFAULT, scale: int = 1) -> tuple[int, str]:
    """The deterministic 'network': status + HTML for any URL."""
    spec = page_spec(url, n_hosts, scale=scale)
    return spec["status"], render_html(spec)


def expected_out_links(spec: dict) -> list[str]:
    """Ground-truth absolutified in-article links, DOM order (X11/W7)."""
    if spec["status"] != 200:
        return []
    base = spec["url"]
    out = []
    for l in spec["links"]:
        href = l["href"]
        if href.startswith("mailto:"):
            continue
        if href.startswith("/"):
            origin = base.split("/", 3)
            out.append(f"{origin[0]}//{origin[2]}{href}")
        else:
            out.append(href)
    return out
