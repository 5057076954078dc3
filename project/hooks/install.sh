#!/bin/sh
# Install repo hooks into .git/hooks.
d="$(git rev-parse --show-toplevel)"
cp "$d/project/hooks/pre-commit" "$d/.git/hooks/pre-commit"
chmod +x "$d/.git/hooks/pre-commit"
echo "installed pre-commit compile gate"
