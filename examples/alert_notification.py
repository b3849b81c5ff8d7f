"""Alert digest delivery: the reference's e-mail step, end to end.

    python examples/alert_notification.py

Runs the covid medallion pipeline on the synthetic fixture days against
a temp warehouse, then delivers the alert digest through
``plans.alerts.notify_alerts`` with two example transports:

1. an SMTP sink (``smtplib`` from the standard library — the direct
   stand-in for the reference's EmailOperator,
   airflow/dags/covid_alerts_dag.py:38-59). Opt-in: set
   ``ALERT_SMTP_HOST`` (and optionally ``ALERT_SMTP_PORT``,
   ``ALERT_FROM``, ``ALERT_TO``); without it the example prints what it
   WOULD send instead of opening a socket, so the script runs anywhere.
2. a webhook sink (``urllib.request`` POST of a JSON payload) — the
   pager/chat-ops variant. Opt-in via ``ALERT_WEBHOOK_URL``.

The engine owns the digest contract (render; short-circuit when the day
has no alerts; one send otherwise) — transports are just callables of
``(subject, html_body)``, so swapping SMTP for a queue or a ticketing
API is a one-liner for the caller.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from covid_data_pipeline_spark.plans.runner import bootstrap_population, run_day
from covid_data_pipeline_spark.plans.alerts import notify_alerts
from covid_data_pipeline_spark.session import get_spark
from covid_data_pipeline_spark.sources.writers import Warehouse


def smtp_sink(subject: str, html_body: str) -> None:
    """EmailOperator stand-in. With no ALERT_SMTP_HOST configured this
    stays a dry run (prints the envelope) so the example is runnable in
    any environment."""
    host = os.environ.get("ALERT_SMTP_HOST")
    sender = os.environ.get("ALERT_FROM", "alerts@example.invalid")
    to = os.environ.get("ALERT_TO", "oncall@example.invalid")
    if not host:
        print(f"[smtp dry-run] To: {to}  Subject: {subject}")
        print(f"[smtp dry-run] {len(html_body)} bytes of HTML body")
        return
    import smtplib
    from email.mime.text import MIMEText

    msg = MIMEText(html_body, "html")
    msg["Subject"], msg["From"], msg["To"] = subject, sender, to
    with smtplib.SMTP(host, int(os.environ.get("ALERT_SMTP_PORT", "25"))) as s:
        s.sendmail(sender, [to], msg.as_string())
    print(f"[smtp] sent {subject!r} to {to}")


def webhook_sink(subject: str, html_body: str) -> None:
    """Chat-ops/pager variant: POST a JSON payload. Dry-run without
    ALERT_WEBHOOK_URL."""
    url = os.environ.get("ALERT_WEBHOOK_URL")
    payload = json.dumps({"subject": subject, "html": html_body}).encode()
    if not url:
        print(f"[webhook dry-run] POST {len(payload)} bytes")
        return
    from urllib.request import Request, urlopen

    req = Request(url, data=payload,
                  headers={"Content-Type": "application/json"})
    with urlopen(req, timeout=10) as resp:
        print(f"[webhook] {resp.status} for {subject!r}")


def main() -> None:
    spark = get_spark(app_name="alert-notification-example")
    from tests.covid_fixtures import DAYS, population_df, write_day_csvs

    with tempfile.TemporaryDirectory() as root, \
            tempfile.TemporaryDirectory() as landing:
        wh = Warehouse(spark, root)
        bootstrap_population(spark, wh, population_df(spark))
        paths = write_day_csvs(landing)
        for day in DAYS:
            run_day(spark, wh, day, csv_path=paths[day])

        for day in DAYS:
            sent = notify_alerts(spark, wh, day, sink=smtp_sink)
            if sent:
                notify_alerts(spark, wh, day, sink=webhook_sink)
            else:
                # The reference's ShortCircuitOperator: quiet days send
                # nothing at all.
                print(f"[{day}] no alerts — short-circuited, no send")

    spark.stop()


if __name__ == "__main__":
    main()
