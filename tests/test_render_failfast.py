"""--render capability probe fails fast (VERDICT r5 item #8).

In this sandbox playwright is absent, so `--render --live` must raise
the documented NotImplementedError BEFORE any SparkSession or plan is
built — a mistyped deploy dies in milliseconds with the remediation
message, not minutes into session startup.
"""

import time

import pytest

from breakchecker_spark import cli


def test_render_flag_fails_fast_with_documented_message():
    t0 = time.time()
    with pytest.raises(NotImplementedError) as exc:
        cli.main(
            [
                "--domain",
                "example.gr",
                "--live",
                "--render",
            ]
        )
    # fast: no JVM was started on the way to the error
    assert time.time() - t0 < 5.0
    msg = str(exc.value)
    assert "playwright" in msg
    assert "renderer_factory" in msg  # points at the tested plug-in shape


def test_render_without_live_still_a_usage_error(capsys):
    with pytest.raises(SystemExit):
        cli.main(["--domain", "example.gr", "--pages", "/tmp/x", "--render"])
    assert "replay" in capsys.readouterr().err
