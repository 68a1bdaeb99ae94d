"""NYT article scraping + sectioning for the demo's /scrape endpoint.

Port of /root/reference/demo/backend/tat/extractor.py:15-199: fetch an
article URL, extract title + paragraph/caption sections across both NYT
HTML generations (post-2019 StoryBodyCompanionColumn layout and the older
story-body-text layout), base64 the images, and assemble the article dict
the captioner consumes. Network fetches are isolated in `get_urls` so the
parsing (`extract_text*`) is unit-testable offline.
"""
from __future__ import annotations

import base64


class ExtractError(Exception):
    pass


def _check_fetchable(url: str, require_nyt: bool = False) -> None:
    """SSRF guard: http(s) only, and (like the reference backend's
    "'nytimes.com' not in url" check, demo/backend/tat/views.py) article
    URLs must be nytimes.com — otherwise /scrape is an open proxy that
    will fetch file:// or internal-network URLs and base64 the response
    back to the caller."""
    from urllib.parse import urlparse
    p = urlparse(url)
    if p.scheme not in ("http", "https"):
        raise ExtractError(f"unsupported URL scheme {p.scheme!r}")
    host = (p.hostname or "").lower()
    if require_nyt and not (host == "nytimes.com"
                            or host.endswith(".nytimes.com")):
        raise ExtractError("Only nytimes.com article URLs are supported.")


def get_urls(url: str) -> dict:
    """Fetch + parse an article URL (requires network egress)."""
    from urllib.request import Request, urlopen
    _check_fetchable(url, require_nyt=True)
    req = Request(url, headers={"User-Agent": "Mozilla/5.0"})
    raw_html = urlopen(req, timeout=10).read().decode("utf-8")
    try:
        parsed_sections, title = extract_text(raw_html)
    except ExtractError:
        raise
    except Exception:
        raise ExtractError("Error parsing the article. Pick another URL.")
    if not parsed_sections:
        raise ExtractError("No article text is found. Pick another URL.")

    image_urls = []
    for section in parsed_sections:
        if section["type"] == "caption" and section.get("url"):
            _check_fetchable(section["url"])  # http(s) only, no file://
            img = urlopen(Request(section["url"],
                                  headers={"User-Agent": "Mozilla/5.0"}),
                          timeout=10).read()
            section["image_data"] = base64.b64encode(img).decode("utf-8")
            image_urls.append(section["url"])
    if not image_urls:
        raise ExtractError("No image is found in the article. "
                           "Pick another URL.")
    return {"sections": parsed_sections, "title": title,
            "image_urls": image_urls}


def extract_article(sections: list[dict], title: str,
                    selected_pos: int = 0) -> dict:
    """Pick the selected_pos-th image and package the captioning request
    (extractor.py:47-61)."""
    positions = [i for i, s in enumerate(sections)
                 if s["type"] == "caption"]
    if not positions:
        raise ExtractError("No image in the parsed sections.")
    pos = positions[selected_pos]
    return {
        "sections": sections,
        "image_position": pos,
        "title": title,
        "true_caption": sections[pos].get("text", ""),
        "image_url": sections[pos].get("url", ""),
    }


def extract_text(html: str) -> tuple[list[dict], str]:
    """Parse raw NYT article HTML into sections + title."""
    import bs4
    soup = bs4.BeautifulSoup(html, "html.parser")
    h1 = soup.find("h1")
    if h1 is None:
        raise ExtractError("No headline found.")
    title = h1.text.strip()

    article = soup.find("article")
    if article is not None and article.find_all(
            "div", {"class": "StoryBodyCompanionColumn"}):
        return _extract_new(soup), title
    if soup.find_all("p", {"class": "story-body-text"}):
        return _extract_old(soup), title
    return [], title


def _image_section(fig) -> dict | None:
    img = fig.find("img")
    cap = fig.find("figcaption")
    if img is None or not img.get("src"):
        return None
    text = cap.text.strip() if cap is not None else ""
    return {"type": "caption", "text": text, "url": img["src"]}


def _extract_new(soup) -> list[dict]:
    """Post-2019 layout: paragraphs inside StoryBodyCompanionColumn divs,
    figures interleaved in the article node (extractor.py:103-160)."""
    sections: list[dict] = []
    article = soup.find("article")
    for node in article.descendants:
        name = getattr(node, "name", None)
        if name == "figure":
            sec = _image_section(node)
            if sec is not None and not any(
                    s["type"] == "caption" and s.get("url") == sec["url"]
                    for s in sections):
                sections.append(sec)
        elif name == "p":
            parent_classes = []
            for anc in node.parents:
                parent_classes.extend(anc.get("class") or []
                                      if hasattr(anc, "get") else [])
            if "StoryBodyCompanionColumn" in parent_classes:
                text = node.text.strip()
                if text:
                    sections.append({"type": "paragraph", "text": text})
    return sections


def _extract_old(soup) -> list[dict]:
    """Pre-2019 layout: p.story-body-text paragraphs, figure.media images
    (extractor.py:163-199)."""
    sections: list[dict] = []
    for node in soup.find_all(["p", "figure"]):
        if node.name == "p" and "story-body-text" in (node.get("class")
                                                      or []):
            text = node.text.strip()
            if text:
                sections.append({"type": "paragraph", "text": text})
        elif node.name == "figure":
            sec = _image_section(node)
            if sec is not None:
                sections.append(sec)
    return sections
