"""Deterministic synthetic web corpus generator (seed=42 by default).

Produces a Common-Crawl-style page set shaped exactly like the engine's
input table ``pages(url, warc_ts, html, text, lang)``:

- hosts drawn Zipf-like so one host holds a large share of URLs (the skew
  case the politeness salting must survive)
- a layered link graph: seeds -> mixed pages -> leaves, cross-host links,
  repeat links to already-seen URLs, links hitting the reject-extension rules
- page text mixes a "topic" vocabulary (same distribution the seed LM is
  trained on) with an "off-topic" vocabulary per-page so all perplexity
  priority buckets are populated
- ~per-host robots.txt rows; some disallow /private/, some set Crawl-delay
- canonicalization traps: uppercase spellings, www./www2. prefixes,
  jsessionid/PHPSESSID decorations, trailing '?'

Everything derives from one ``random.Random(seed)`` stream — same seed, same
corpus, byte for byte.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field

TOPIC_VOCAB = (
    "cat cats kitten feline whiskers paw paws tail purr purrs meow litter "
    "tabby siamese tomcat mouser claw claws fur grooming catnip perch hunt "
    "hunts prey pounce stalk nap naps sleeps windowsill yarn string toy"
).split()

OFFTOPIC_VOCAB = (
    "turbine manifold actuator flange piston crankshaft torque injector "
    "compressor gasket camshaft valve solenoid dynamo armature rotor stator "
    "bearing coupling gearbox flywheel throttle carburetor ignition exhaust"
).split()

TOPIC_SENTENCE_LEN = (5, 12)


def _sentence(rng: random.Random, vocab: list[str]) -> str:
    n = rng.randint(*TOPIC_SENTENCE_LEN)
    words = [rng.choice(vocab) for _ in range(n)]
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


def topic_corpus(seed: int = 42, n_sentences: int = 400) -> str:
    """The seed-topic LM training text."""
    rng = random.Random(seed * 7919 + 13)
    return "\n".join(_sentence(rng, TOPIC_VOCAB) for _ in range(n_sentences))


@dataclass
class SyntheticCorpus:
    pages: dict[str, bytes]  # url -> utf-8 html
    seeds: list[str]
    hosts: list[str]
    meta: dict = field(default_factory=dict)


def _page_html(
    rng: random.Random,
    topicality: float,
    links: list[str],
    chrome: tuple[str, str] | None = None,
) -> str:
    # page sizes roughly matching real crawl text volumes (tens of sentences)
    n_paras = rng.randint(2, 6)
    paras = []
    for _ in range(n_paras):
        sents = []
        for _ in range(rng.randint(4, 10)):
            vocab = TOPIC_VOCAB if rng.random() < topicality else OFFTOPIC_VOCAB
            sents.append(_sentence(rng, vocab))
        paras.append("<p>\n" + "\n".join(sents) + "\n</p>")
    anchors = "\n".join(f'<a href="{u}">{i}</a>' for i, u in enumerate(links))
    # per-host boilerplate "site chrome" (header nav / footer) — like real web
    # pages, a sizable share of every page's extracted text repeats site-wide
    head = f"<p>\n{chrome[0]}\n</p>\n" if chrome else ""
    foot = f"\n<p>\n{chrome[1]}\n</p>" if chrome else ""
    return (
        "<html>\n<body>\n" + head + "\n".join(paras) + "\n" + anchors + foot + "\n</body>\n</html>"
    )


def generate_corpus(
    n_pages: int = 1000,
    n_hosts: int = 20,
    n_seeds: int = 3,
    links_per_page: int = 6,
    seed: int = 42,
    robots_fraction: float = 0.5,
    disallow_fraction: float = 0.1,
    crawl_delay_fraction: float = 0.05,
    canonical_trap_fraction: float = 0.05,
) -> SyntheticCorpus:
    rng = random.Random(seed)
    hosts = [f"host{h}.example" for h in range(n_hosts)]

    # Zipf-ish host sizes: host0 gets ~30% of pages
    weights = [1.0 / (h + 1) ** 1.2 for h in range(n_hosts)]
    wsum = sum(weights)
    weights = [w / wsum for w in weights]

    urls: list[str] = []
    url_host: dict[str, int] = {}
    for i in range(n_pages):
        h = rng.choices(range(n_hosts), weights)[0]
        url = f"http://{hosts[h]}/p{i}.html"
        urls.append(url)
        url_host[url] = h

    # per-host site chrome: a few boilerplate sentences every page of the
    # host shares (header/footer text), as on real sites
    host_chrome: list[tuple[str, str]] = []
    for h in range(n_hosts):
        crng = random.Random(seed * 104729 + h)
        head = " ".join(_sentence(crng, OFFTOPIC_VOCAB) for _ in range(2))
        foot = " ".join(_sentence(crng, OFFTOPIC_VOCAB) for _ in range(3))
        host_chrome.append((head, foot))

    # topicality per page: seeds' host pages lean topical; random otherwise
    pages: dict[str, bytes] = {}
    for i, url in enumerate(urls):
        r = rng.random()
        if r < 0.25:
            topicality = rng.uniform(0.85, 1.0)  # HIGH bucket
        elif r < 0.6:
            topicality = rng.uniform(0.35, 0.7)  # MEDIUM-ish
        else:
            topicality = rng.uniform(0.0, 0.2)  # NORMAL / reject

        n_links = rng.randint(1, links_per_page)
        links: list[str] = []
        for _ in range(n_links):
            x = rng.random()
            if x < 0.7:
                # same-host link
                target = rng.choice(urls)
                while url_host[target] != url_host[url] and rng.random() < 0.8:
                    target = rng.choice(urls)
            else:
                target = rng.choice(urls)
            # canonicalization traps on some links
            t = rng.random()
            if t < canonical_trap_fraction:
                target = target.replace("http://", "http://WWW.")
            elif t < 2 * canonical_trap_fraction:
                target = target + "?"
            elif t < 3 * canonical_trap_fraction:
                target = target.replace(".html", ".HTML".lower()) + (
                    ";jsessionid=" + "a1b2c3d4e5f6a7b8c9d0e1f2a3b4c5d6"
                )
            links.append(target)
        if rng.random() < 0.1:
            links.append(f"http://{hosts[url_host[url]]}/media{i}.jpg")
        if rng.random() < 0.05:
            links.append(f"http://{hosts[url_host[url]]}/archive{i}.zip")
        if rng.random() < 0.08:
            links.append(f"http://{hosts[url_host[url]]}/private/s{i}.html")

        pages[url] = _page_html(
            rng, topicality, links, chrome=host_chrome[url_host[url]]
        ).encode("utf-8")

    # robots
    for h, host in enumerate(hosts):
        if rng.random() < robots_fraction:
            body = ["User-agent: *"]
            if rng.random() < disallow_fraction * 2:
                body.append("Disallow: /private/")
            if rng.random() < crawl_delay_fraction * 2:
                body.append("Crawl-delay: 2")
            pages[f"http://{host}/robots.txt"] = "\n".join(body).encode("utf-8")

    # /private/ pages exist (so blocked URLs would be fetchable if not gated)
    for i in range(0, n_pages, 37):
        host = hosts[url_host[urls[i]]]
        pages[f"http://{host}/private/s{i}.html"] = _page_html(
            rng, 0.9, [urls[i]]
        ).encode("utf-8")

    # seeds: pages spread round-robin over hosts; when n_seeds > n_hosts the
    # list deepens per host (large seed lists are the norm for focused
    # crawls — Heritrix seed files routinely hold 10^4..10^6 URLs)
    per_host: dict[int, list[str]] = {h: [] for h in range(n_hosts)}
    for u in urls:
        per_host[url_host[u]].append(u)
    seeds = []
    depth = 0
    while len(seeds) < n_seeds and depth < n_pages:
        added = False
        for h in range(n_hosts):
            lst = per_host[h]
            if depth < len(lst):
                seeds.append(lst[depth])
                added = True
                if len(seeds) >= n_seeds:
                    break
        if not added:
            break
        depth += 1

    return SyntheticCorpus(pages=pages, seeds=seeds, hosts=hosts, meta={"seed": seed})


def pages_dataframe(spark, corpus: SyntheticCorpus, base_ts: str = "2024-12-20 00:00:00"):
    """The corpus as the canonical ``pages`` input table (Arrow-path load)."""
    import pandas as pd
    from pyspark.sql import functions as F

    items = sorted(corpus.pages.items())
    pdf = pd.DataFrame(
        {
            "url": [u for u, _ in items],
            "_i": range(len(items)),
            "html": [h for _, h in items],
        }
    )
    df = spark.createDataFrame(pdf, "url string, _i long, html binary")
    return df.select(
        "url",
        (F.to_timestamp(F.lit(base_ts)) + F.make_interval(secs=F.col("_i"))).alias("warc_ts"),
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit("en").alias("lang"),
    )
