"""Deterministic mock API backend for the ingestion sources (picklable).

Produces GitHub REST / GraphQL / Reddit / HN-Algolia shaped payloads from
seeded synthetic data, including pagination, PRs mixed into the issues feed,
labels, accepted answers, and comment trees with HTML tags — everything the
adapters' semantics touch.
"""

from __future__ import annotations

import random
from typing import Dict, List, Optional, Tuple


class MockAPI:
    def __init__(self, seed: int = 42, n_issues: int = 130, n_discussions: int = 80,
                 n_releases: int = 7, n_posts_per_term: int = 12):
        rng = random.Random(seed)
        self.issues: Dict[str, List[dict]] = {}
        self.discussions: Dict[str, List[dict]] = {}
        self.releases: Dict[str, List[dict]] = {}
        self.comments: Dict[Tuple[str, int], List[dict]] = {}
        self.n_posts_per_term = n_posts_per_term
        self.seed = seed

        def words(n):
            return " ".join(rng.choice(["fast", "query", "table", "merge", "bug",
                                        "crash", "great", "slow", "cluster"]) for _ in range(n))

        for repo in ("acme/acme-db", "acme/acme-tools"):
            issues = []
            for i in range(n_issues):
                num = 1000 + i
                labels = []
                if i % 4 == 0:
                    labels.append({"name": "bug"})
                if i % 5 == 0:
                    labels.append({"name": "enhancement"})
                item = {
                    "number": num,
                    "title": f"Issue {num}: {words(4)}",
                    "body": words(30),
                    "state": "open" if i % 3 else "closed",
                    "labels": labels,
                    "comments": i % 6,
                    "created_at": f"2025-0{1 + i % 9}-01T00:00:00Z",
                    "user": {"login": f"user{i % 7}"},
                    "html_url": f"https://github.com/{repo}/issues/{num}",
                }
                if i % 10 == 9:  # a PR mixed into the issues feed
                    item["pull_request"] = {"url": "x"}
                issues.append(item)
                self.comments[(repo, num)] = [
                    {"body": words(12), "user": {"login": f"commenter{j}"}}
                    for j in range(min(3, i % 6))
                ]
            self.issues[repo] = issues

            self.discussions[repo] = [
                {
                    "number": 2000 + i,
                    "title": f"Discussion {2000 + i}",
                    "body": words(25),
                    "category": {"name": "Q&A" if i % 2 else "Ideas"},
                    "isAnswered": i % 3 == 0,
                    "answer": {"body": words(15)} if i % 3 == 0 else None,
                    "comments": {"totalCount": i % 5},
                    "createdAt": f"2025-01-{1 + i % 27:02d}T00:00:00Z",
                    "author": {"login": f"author{i % 5}"},
                    "url": f"https://github.com/{repo}/discussions/{2000 + i}",
                }
                for i in range(n_discussions)
            ]

            self.releases[repo] = [
                {
                    "tag_name": f"v1.{i}.0",
                    "name": f"Version 1.{i}",
                    "body": words(20),
                    "prerelease": i % 3 == 2,
                    "created_at": f"2025-02-{1 + i:02d}T00:00:00Z",
                    "html_url": f"https://github.com/{repo}/releases/tag/v1.{i}.0",
                }
                for i in range(n_releases)
            ]

    # -- GitHub REST ------------------------------------------------------

    def github_issues(self, repo, state, sort, direction, per_page, page):
        items = self.issues.get(repo, [])
        start = (page - 1) * per_page
        return items[start : start + per_page]

    def github_issue_comments(self, repo, number, per_page):
        return self.comments.get((repo, number), [])[:per_page]

    def github_releases(self, repo, per_page, page):
        items = self.releases.get(repo, [])
        start = (page - 1) * per_page
        return items[start : start + per_page]

    # -- GitHub GraphQL (cursor) ------------------------------------------

    def github_discussions(self, repo, first, after):
        items = self.discussions.get(repo, [])
        start = int(after) if after else 0
        nodes = items[start : start + first]
        end = start + len(nodes)
        return nodes, end < len(items), str(end)

    # -- Reddit -----------------------------------------------------------

    def reddit_search(self, query, subreddit, limit):
        rng = random.Random(f"{self.seed}:{query}:{subreddit}")
        out = []
        for i in range(min(self.n_posts_per_term, limit)):
            # overlapping permalinks across terms → exercises seen-set dedup
            pid = rng.randrange(40)
            out.append(
                {
                    "title": f"Post {pid} about {query}",
                    "selftext": ("the fast query is great but has a bug crash " * 3)
                    if pid % 2 else "",
                    "subreddit": subreddit or "databases",
                    "score": pid * 3,
                    "num_comments": pid % 7,
                    "author": f"redditor{pid % 9}",
                    "created_utc": 1700000000.0 + pid * 1000,
                    "permalink": f"/r/databases/comments/{pid}/post_{pid}/",
                }
            )
        return out

    # -- HN Algolia -------------------------------------------------------

    def hn_search(self, query, hits_per_page):
        rng = random.Random(f"{self.seed}:hn:{query}")
        out = []
        for i in range(min(self.n_posts_per_term, hits_per_page)):
            sid = 30000 + rng.randrange(60)
            out.append(
                {
                    "objectID": str(sid),
                    "title": f"Story {sid}: {query} benchmark",
                    "url": f"https://ext.example/{sid}" if sid % 2 else "",
                    "points": sid % 20,
                    "num_comments": sid % 11,
                    "author": f"hnuser{sid % 5}",
                    "created_at": "2025-03-01T00:00:00Z",
                }
            )
        return out

    def hn_item(self, story_id):
        rng = random.Random(f"{self.seed}:item:{story_id}")
        return {
            "children": [
                {
                    "text": f"<p>comment {j} says the <i>fast query</i> is "
                            f"{'great' if j % 2 else 'slow'}</p>",
                    "author": f"hnc{j}",
                }
                for j in range(rng.randrange(2, 8))
            ]
        }
