"""E8 site-specific handler + E9 nav-detector unit tests (ref:603-1185)."""

from webtext.dom import parse_html
from webtext.oracle.handlers import (
    handle_chiebukuro,
    handle_instagram,
    handle_pinterest,
    handle_twitter,
    is_pinterest_navigation_error,
)

URL = "https://example.test/x"


# -- twitter ----------------------------------------------------------------

def test_twitter_joins_articles_with_blank_lines():
    doc = parse_html("<body><article><div>tweet one</div></article>"
                     "<article><span>tweet</span> <span>two</span></article>"
                     "</body>")
    assert handle_twitter(doc, URL) == "tweet one\n\ntweet two"


def test_twitter_no_articles_returns_empty():
    doc = parse_html("<body><p>nothing</p></body>")
    assert handle_twitter(doc, URL) == ""


# -- instagram --------------------------------------------------------------

def test_instagram_caption_length_gate():
    doc = parse_html("<body><article><h1>a caption easily above twenty"
                     " chars</h1><span>short</span></article></body>")
    out = handle_instagram(doc, URL)
    assert "above twenty" in out and "short" not in out


def test_instagram_fallback_selector():
    doc = parse_html('<body><article><span>tiny</span></article>'
                     '<div class="_a9zs">fallback caption text</div></body>')
    assert handle_instagram(doc, URL) == "fallback caption text"


def test_instagram_not_found_message():
    doc = parse_html("<body><article><span>tiny</span></article></body>")
    out = handle_instagram(doc, URL)
    assert out == f"Instagramポストからテキストが見つかりませんでした: {URL}"
    # the quirk: this message does NOT carry the dispatcher failure marker
    assert "失敗しました" not in out


# -- chiebukuro -------------------------------------------------------------

def test_chiebukuro_left_column_removes_related_and_ads():
    doc = parse_html("""<body><div id="leftColumn">
      <h1 class="Title__title">質問タイトルです</h1>
      <div class="ClapLv2__item">回答その一です</div>
      <div class="RelatedBox"><h3>あわせて知りたい</h3>関連テキスト</div>
      <div class="AdArea">広告</div>
      <div class="side-bar">サイド</div>
      <div class="PaginationRow">ページ</div>
    </div></body>""")
    out = handle_chiebukuro(doc, URL)
    assert "質問タイトル" in out and "回答その一" in out
    assert "あわせて知りたい" not in out
    assert "広告" not in out and "サイド" not in out and "ページ" not in out


def test_chiebukuro_selector_path_labels():
    doc = parse_html('<body><h1 class="Title__title">Q本文</h1>'
                     '<div class="ClapLv1__content">質問の内容です</div>'
                     '<div class="ClapLv2__item">回答A</div>'
                     '<div class="ClapLv2__item">回答B</div></body>')
    out = handle_chiebukuro(doc, URL)
    assert out.startswith("【質問】Q本文")
    assert "【回答】" in out
    assert out.index("回答A") < out.index("回答B")


def test_chiebukuro_longest_blocks_fallback():
    big1 = "あ" * 150
    big2 = "い" * 120
    doc = parse_html(f'<body><div class="x"><h2>見出し</h2>{big1}</div>'
                     f'<div class="y">{big2}</div></body>')
    out = handle_chiebukuro(doc, URL)
    assert "見出し" in out          # title candidate from biggest block
    assert big2 in out


def test_chiebukuro_empty_returns_not_found():
    doc = parse_html("<body></body>")
    out = handle_chiebukuro(doc, URL)
    assert out == f"知恵袋からコンテンツを抽出できませんでした: {URL}"


# -- pinterest nav detector -------------------------------------------------

STRICT_NAV = (
    "Skip to content Explore ideas Search for easy dinners, fashion, etc. "
    "When autocomplete results are available use up and down arrows to "
    "review and enter to select. Touch device users, explore by touch or "
    "with swipe gestures. Log in Sign up")


def test_nav_detector_strict_pattern():
    assert is_pinterest_navigation_error(STRICT_NAV)


def test_nav_detector_content_indicator_blocks():
    assert not is_pinterest_navigation_error(
        STRICT_NAV + " see https://real.example.com/x")
    assert not is_pinterest_navigation_error(
        STRICT_NAV + " 日本語の長い記事タイトルがここにあります")


def test_nav_detector_ratio_branch():
    # ≥4 phrases and >70% nav characters
    text = ("Skip to content Explore ideas Search for easy dinners "
            "When autocomplete results are available Log in Sign up")
    assert is_pinterest_navigation_error(text)


def test_nav_detector_normal_text_passes():
    assert not is_pinterest_navigation_error(
        "a perfectly ordinary paragraph about knitting and yarn")


# -- pinterest handler ------------------------------------------------------

def test_pinterest_selector_families_and_caps():
    spans = "".join(
        f"<div data-test-id='pin-domain-link'><span>site{i}.io</span></div>"
        for i in range(5))
    doc = parse_html(f"""<body>{spans}
      <h1 data-test-id="pin-title">lovely craft pin title</h1>
      <div data-test-id="pin-description"><span>a rather long description
      of the pin content</span></div></body>""")
    out = handle_pinterest(doc, URL)
    # domain cap = 3 (ref:1116)
    assert "site2.io" in out and "site3.io" not in out
    assert "lovely craft pin title" in out


def test_pinterest_large_div_fallback():
    big = "filler words " * 20
    doc = parse_html(f"<body><div class='plain'>{big}</div></body>")
    out = handle_pinterest(doc, URL)
    assert "filler words" in out


def test_pinterest_empty_returns_not_found():
    doc = parse_html("<body></body>")
    out = handle_pinterest(doc, URL)
    assert out == f"Pinterestからコンテンツを抽出できませんでした: {URL}"
