#!/usr/bin/env python3
"""Deterministic flipkart-schema synthetic fixture (seed pinned).

The reference's primary dataset (reference src/load_flipkart.py:11-49) is a
20K-row e-commerce CSV whose blob is stripped from the checkout, so the
flipkart SPINE (fillna -> category-tree split -> regex scrub -> specs
reformat -> LogTransform prices -> encode -> fused top-k) is exercised on
this synthetic twin of its schema: same column set, same messy value
conventions ('["A >> B >> C"]' trees, '"key"=>"Type", "value"=>"Shirt"'
specs, false/true advantage flag, empty-field nulls, quoted/comma'd names).

Regenerate (bit-identical) with:  python3 tools/make_flipkart_synth.py
Output: data/flipkart/flipkart_synth.csv.gz  (~20K rows)
"""
import csv
import gzip
import hashlib
import io
import os
import random

N = 20000
SEED = 94

TAXONOMY = {
    "Clothing": {
        "Women's Clothing": ["Ethnic Wear", "Western Wear", "Lingerie, Sleep & Swimwear"],
        "Men's Clothing": ["T-Shirts", "Shirts", "Jeans"],
        "Kids' Clothing": ["Clothing Sets", "Tops & Tees"],
    },
    "Footwear": {
        "Women's Footwear": ["Flats", "Heels", "Wedges"],
        "Men's Footwear": ["Casual Shoes", "Formal Shoes", "Sports Shoes"],
    },
    "Jewellery": {
        "Necklaces & Chains": ["Necklaces", "Chains"],
        "Bangles, Bracelets & Armlets": ["Bangles", "Bracelets"],
    },
    "Mobiles & Accessories": {
        "Mobile Accessories": ["Cases & Covers", "Screen Guards", "Chargers & Cables"],
        "Tablet Accessories": ["Tablet Covers", "Tablet Chargers"],
    },
    "Home Decor & Festive Needs": {
        "Showpieces": ["Ethnic Showpieces", "Modern Showpieces"],
        "Wall Decor & Clocks": ["Wall Clocks", "Paintings"],
    },
    "Automotive": {
        "Accessories & Spare parts": ["Car Interior & Exterior", "Bike Accessories"],
        "Car & Bike Care": ["Polishes", "Cleaners"],
    },
    "Kitchen & Dining": {
        "Cookware": ["Pots & Pans", "Pressure Cookers"],
        "Tableware & Cutlery": ["Dinner Sets", "Glasses & Tumblers"],
    },
    "Computers": {
        "Laptop Accessories": ["Laptop Skins & Decals", "Laptop Bags"],
        "Network Components": ["Routers", "Data Cards"],
    },
    "Toys & School Supplies": {
        "Toys": ["Soft Toys", "Action Figures"],
        "School Supplies": ["Pencil Boxes", "Water Bottles"],
    },
    "Beauty and Personal Care": {
        "Makeup": ["Lipsticks", "Nail Polish"],
        "Hair Care": ["Shampoos", "Hair Oils"],
    },
}
L1S = list(TAXONOMY)

BRANDS = [
    "Alisha", "FabHomeDecor", "AW", "Sicons", "Eternal Gandhi", "dilli bazaaar",
    "Ladela", "Carrel", "Freelance", "Style Foot", "Shining Diva", "Voylla",
    "Sathiyas", "Bengal Blooms", "Rajcrafts", "Bosky", "TheLostPuppy", "Regular",
    "Olvin", "Rorlig", "Black Radio", "Rochees", "WDS", "Swiss Style", "Oye",
    "Speedwav", "Pixelartz", "Mudra", "Himmlisch", "Kennel",
]
ADJS = [
    "Classic", "Premium", "Stylish", "Elegant", "Casual", "Printed", "Solid",
    "Embellished", "Handcrafted", "Designer", "Sporty", "Vintage", "Trendy",
    "Graceful", "Royal",
]
COLORS = ["Red", "Blue", "Green", "Black", "White", "Multicolor", "Gold",
          "Silver", "Pink", "Beige"]
MATERIALS = ["Cotton", "Leather", "Alloy", "Wood", "Silicone", "Polyester",
             "Steel", "Ceramic", "Canvas", "Brass"]
SPEC_KEYS = ["Type", "Color", "Material", "Ideal For", "Pattern", "Occasion",
             "Fit", "Pack of", "Sales Package", "Brand"]


def specs_blob(rng, brand, color, material, leaf):
    vals = {
        "Type": leaf, "Color": color, "Material": material,
        "Ideal For": rng.choice(["Men", "Women", "Boys", "Girls", "Unisex"]),
        "Pattern": rng.choice(["Solid", "Printed", "Striped", "Embroidered"]),
        "Occasion": rng.choice(["Casual", "Formal", "Party", "Festive"]),
        "Fit": rng.choice(["Regular", "Slim", "Loose"]),
        "Pack of": str(rng.randint(1, 4)),
        "Sales Package": "1 " + leaf.rstrip("s"),
        "Brand": brand,
    }
    n = rng.randint(2, 5)
    keys = rng.sample(SPEC_KEYS, n)
    parts = []
    for k in keys:
        # ~2% of entries mimic the real data's key-less specs ({"value"=>..})
        # which breaks strict key/value alternation — both engines alternate
        # positionally regardless, so this exercises that faithfully.
        if rng.random() < 0.02:
            parts.append('{"value"=>"%s"}' % vals[k])
        else:
            parts.append('{"key"=>"%s", "value"=>"%s"}' % (k, vals[k]))
    return '{"product_specification"=>[%s]}' % ", ".join(parts)


def main():
    rng = random.Random(SEED)
    out_dir = os.path.join(os.path.dirname(__file__), "..", "data", "flipkart")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, "flipkart_synth.csv.gz")
    buf = io.StringIO()
    w = csv.writer(buf, quoting=csv.QUOTE_MINIMAL, lineterminator="\n")
    w.writerow([
        "uniq_id", "crawl_timestamp", "product_url", "product_name",
        "product_category_tree", "pid", "retail_price", "discounted_price",
        "image", "is_FK_Advantage_product", "description", "product_rating",
        "overall_rating", "brand", "product_specifications",
    ])
    for i in range(N):
        l1 = rng.choice(L1S)
        l2 = rng.choice(list(TAXONOMY[l1]))
        leaf = rng.choice(TAXONOMY[l1][l2])
        brand = rng.choice(BRANDS)
        adj = rng.choice(ADJS)
        color = rng.choice(COLORS)
        material = rng.choice(MATERIALS)
        uid = hashlib.md5(b"flip%d" % i).hexdigest()
        # product names are unique by serial; a slice carries the CSV
        # stress: commas (5%), embedded double quotes (2%)
        name = "%s %s %s (%05d)" % (brand, adj, leaf, i)
        r = rng.random()
        if r < 0.02:
            name = '%s "%s" %s (%05d)' % (brand, adj, leaf, i)
        elif r < 0.07:
            name = "%s, %s %s (%05d)" % (brand, adj, leaf, i)
        depth_r = rng.random()
        levels = [l1, l2, leaf, name]
        if depth_r < 0.05:
            levels = [l1, l2]            # -> product_category_3 NULL
        elif depth_r < 0.50:
            levels = [l1, l2, leaf]
        elif depth_r < 0.90:
            levels = [l1, l2, leaf, name]
        else:
            levels = [l1, l2, leaf, name, adj + " " + leaf]
        tree = '["%s"]' % " >> ".join(levels)
        retail = int(round(min(max(rng.lognormvariate(7.0, 1.2), 49), 99999)))
        disc = int(round(retail * rng.uniform(0.35, 0.97)))
        retail_s = "" if rng.random() < 0.02 else str(retail)
        disc_s = "" if rng.random() < 0.03 else str(disc)
        desc = ("%s %s %s by %s - %s, %s. Buy %s online at best price in "
                "India, only on Flipkart.com." %
                (adj, color.lower(), leaf.lower(), brand, material,
                 rng.choice(["easy returns", "free shipping", "COD available"]),
                 leaf.lower()))
        if rng.random() < 0.03:
            desc = ""                    # -> fillna 'n/a'
        brand_s = "" if rng.random() < 0.10 else brand
        adv = "true" if rng.random() < 0.15 else "false"
        rating = ("No rating available" if rng.random() < 0.85
                  else "%.1f" % rng.uniform(1.0, 5.0))
        w.writerow([
            uid,
            "2016-0%d-%02d %02d:%02d:00 +0000" % (rng.randint(1, 6),
                rng.randint(1, 28), rng.randint(0, 23), rng.randint(0, 59)),
            "http://www.flipkart.com/%s/p/itm%s" %
                (leaf.lower().replace(" ", "-").replace("&", "and"), uid[:16]),
            name, tree, "P" + uid[:15].upper(), retail_s, disc_s,
            '["http://img.fkcdn.com/%s.jpg"]' % uid[:12], adv, desc,
            rating, rating, brand_s,
            "" if rng.random() < 0.02
            else specs_blob(rng, brand, color, material, leaf),
        ])
    data = buf.getvalue().encode("utf-8")
    # mtime=0 so the gzip output is bit-identical across regenerations
    with open(out, "wb") as f:
        with gzip.GzipFile(fileobj=f, mode="wb", mtime=0) as gz:
            gz.write(data)
    print("wrote %s (%d rows, %d bytes gz)" %
          (out, N, os.path.getsize(out)))


if __name__ == "__main__":
    main()
