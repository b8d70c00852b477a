"""The reference's own 4-document worked example, reconstructed from the
golden log /root/reference/report_clusters_snippets.txt:5-20 (document
contents at lines 5-8 with newlines restored from the token boundaries,
expected token streams at lines 9-12, tf maps at 13-16, tfidf at 17-20).

Used as exact unit-test vectors for tokenizer, tf, df, and the reference
TF-IDF formula sqrt(tf) * (1 + ln(N / (df + 1))) with N=4.
"""

DOC_FALSE_WISDOM = "=== ===\nfalse wisdom\nhollow expertise"

DOC_YELP = (
    "=== ===\n"
    "https://www.yelp.com/search?find_desc=citizen+advisor&find_loc=95128\n"
    "https://www.yelp.com/search?find_desc=debt+advisor&find_loc=95128&cflt=debtrelief\n"
    "https://www.yelp.com/search?find_desc=car+loan+advisor&find_loc=95128"
)

DOC_FRAMEWORK = (
    "=== ===\n"
    "Framework, platform free labor\n"
    "whenever there is someone/thing above you, you are in a framework.\n"
    'This doesn\'t just apply to programming. It applies to when you get '
    '"leveraged" as free labor for someone else\'s platform like Stack '
    "Overflow, Wikipedia, forums..."
)

DOC_WEB = (
    "=== ===\n"
    "web applications notes\n"
    "http://download.oracle.com/otn-pub/jcp/servlet-3.0-fr-eval-oth-JSpec/"
    "servlet-3_0-final-spec.pdf?AuthParam=1477539051_ff4bf4af3287353c19458bd80d6bf66b\n"
    "open file system\n"
    "archive file\n"
    "document root\n"
    "no other files contained in the web-inf directory may be served "
    "directly to a client\n"
    "meta-inf/manifest.mf entry in the war file listing all extensions needed\n"
    "an application containing only static files or JSP pages does not "
    "require a web.xml to be present"
)

TINY_DOCS = {
    "snpt_false_wisdom.mwk": DOC_FALSE_WISDOM,
    "snpt_yelp.mwk": DOC_YELP,
    "snpt_framework.mwk": DOC_FRAMEWORK,
    "snpt_web.mwk": DOC_WEB,
}

# Expected token streams, verbatim from report_clusters_snippets.txt:9-12.
EXPECTED_TOKENS = {
    "snpt_false_wisdom.mwk": ["fals", "wisdom", "hollow", "expertis"],
    "snpt_yelp.mwk": [
        "http", "www.yelp.com", "search", "find_desc", "citizen", "advisor",
        "find_loc", "95128", "http", "www.yelp.com", "search", "find_desc",
        "debt", "advisor", "find_loc", "95128", "cflt", "debtrelief", "http",
        "www.yelp.com", "search", "find_desc", "car", "loan", "advisor",
        "find_loc", "95128",
    ],
    "snpt_framework.mwk": [
        "framework", "platform", "free", "labor", "thing", "framework",
        "appli", "program", "appli", "leverag", "free", "labor", "platform",
        "stack", "overflow", "wikipedia", "forum",
    ],
    "snpt_web.mwk": [
        "web", "applic", "note", "http", "download.oracle.com", "otn", "pub",
        "jcp", "servlet", "3.0", "fr", "eval", "oth", "jspec", "servlet",
        "3_0", "final", "spec.pdf", "authparam",
        "1477539051_ff4bf4af3287353c19458bd80d6bf66b", "open", "file",
        "system", "archiv", "file", "document", "root", "file", "contain",
        "web", "inf", "directori", "serv", "directli", "client", "meta",
        "inf", "manifest.mf", "entri", "war", "file", "list", "extens",
        "need", "applic", "static", "file", "jsp", "requir", "web.xml",
    ],
}

# Expected per-doc TF-IDF values, from report_clusters_snippets.txt:17-20,
# keyed by term (dictionary ids resolved by hand: tf ties the id to a term).
# score = sqrt(tf) * (1 + ln(4 / (df + 1))).
EXPECTED_TFIDF = {
    "snpt_false_wisdom.mwk": {
        "fals": 1.6931471824645996,
        "wisdom": 1.6931471824645996,
        "hollow": 1.6931471824645996,
        "expertis": 1.6931471824645996,
    },
    "snpt_yelp.mwk": {
        "www.yelp.com": 2.932616949081421,
        "search": 2.932616949081421,
        "find_desc": 2.932616949081421,
        "find_loc": 2.932616949081421,
        "95128": 2.932616949081421,
        "advisor": 2.932616949081421,
        "http": 2.2303307056427,          # tf=3, df=2 (also in web doc)
        "citizen": 1.6931471824645996,
        "debt": 1.6931471824645996,
        "car": 1.6931471824645996,
        "loan": 1.6931471824645996,
        "cflt": 1.6931471824645996,
        "debtrelief": 1.6931471824645996,
    },
    "snpt_framework.mwk": {
        "framework": 2.3944716453552246,
        "platform": 2.3944716453552246,
        "free": 2.3944716453552246,
        "labor": 2.3944716453552246,
        "appli": 2.3944716453552246,      # tf=2 — "apply" + "applies"
        "thing": 1.6931471824645996,
        "program": 1.6931471824645996,
        "leverag": 1.6931471824645996,
        "stack": 1.6931471824645996,
        "overflow": 1.6931471824645996,
        "wikipedia": 1.6931471824645996,
        "forum": 1.6931471824645996,
    },
}
# web doc: spot values only (42 terms) — file tf=5 df=1; web/applic/servlet/
# inf tf=2 df=1; http tf=1 df=2.
EXPECTED_TFIDF_WEB_SPOT = {
    "file": 3.78599214553833,
    "web": 2.3944716453552246,
    "applic": 2.3944716453552246,
    "servlet": 2.3944716453552246,
    "inf": 2.3944716453552246,
    "http": 1.287682056427002,
    "wisdom_absent": None,
}
