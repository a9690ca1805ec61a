"""SSWU isogeny data per curve (derived by tools/derive_isogeny.py).

Each entry: {"A": A', "B": B', "Z": Z, "iso": (x_num, x_den, y_num, y_den)}
with polynomial coefficient lists low-degree-first.  G1 entries are over Fp
(ints); G2 entries over Fp2 (int pairs).

BLS12_381 G1: the 11-isogenous curve recovered from first principles
(division polynomial of ell=11, Velu, dual via phi(other subgroup)); the
resulting (A', B', Z) match the RFC 9380 BLS12381G1 ciphersuite constants
exactly.  The rational maps are the normalized Velu dual, composed for G2
with the codomain automorphism (x,y)->(w*x,y) (w a primitive cube root of
unity in Fp) that matches the RFC's normalization; both G1 and G2 maps are
pinned byte-for-byte against RFC 9380 J.9.1/J.10.1 in
tests/test_hash_vectors.py.
"""

G1 = {
    "BLS12_381": {
        "A": 0x144698a3b8e9433d693a02c96d4982b0ea985383ee66a8d8e8981aefd881ac98936f8da0e0f97f5cf428082d584c1d,
        "B": 0x12e2908d11688030018b12e8753eee3b2016c1f0f24f4070a0b9c14fcef35ef55a23215a316ceaa5d1cc48e98e172be0,
        "Z": 11,
        "iso": (
            [
                0x11a05f2b1e833340b809101dd99815856b303e88a2d7005ff2627b56cdb4e2c85610c2d5f2e62d6eaeac1662734649b7,
                0x17294ed3e943ab2f0588bab22147a81c7c17e75b2f6a8417f565e33c70d1e86b4838f2a6f318c356e834eef1b3cb83bb,
                0xd54005db97678ec1d1048c5d10a9a1bce032473295983e56878e501ec68e25c958c3e3d2a09729fe0179f9dac9edcb0,
                0x1778e7166fcc6db74e0609d307e55412d7f5e4656a8dbf25f1b33289f1b330835336e25ce3107193c5b388641d9b6861,
                0xe99726a3199f4436642b4b3e4118e5499db995a1257fb3f086eeb65982fac18985a286f301e77c451154ce9ac8895d9,
                0x1630c3250d7313ff01d1201bf7a74ab5db3cb17dd952799b9ed3ab9097e68f90a0870d2dcae73d19cd13c1c66f652983,
                0xd6ed6553fe44d296a3726c38ae652bfb11586264f0f8ce19008e218f9c86b2a8da25128c1052ecaddd7f225a139ed84,
                0x17b81e7701abdbe2e8743884d1117e53356de5ab275b4db1a682c62ef0f2753339b7c8f8c8f475af9ccb5618e3f0c88e,
                0x80d3cf1f9a78fc47b90b33563be990dc43b756ce79f5574a2c596c928c5d1de4fa295f296b74e956d71986a8497e317,
                0x169b1f8e1bcfa7c42e0c37515d138f22dd2ecb803a0c5c99676314baf4bb1b7fa3190b2edc0327797f241067be390c9e,
                0x10321da079ce07e272d8ec09d2565b0dfa7dccdde6787f96d50af36003b14866f69b771f8c285decca67df3f1605fb7b,
                0x6e08c248e260e70bd1e962381edee3d31d79d7e22c837bc23c0bf1bc24c6b68c24b1b80b64d391fa9c8ba2e8ba2d229,
            ],
            [
                0x8ca8d548cff19ae18b2e62f4bd3fa6f01d5ef4ba35b48ba9c9588617fc8ac62b558d681be343df8993cf9fa40d21b1c,
                0x12561a5deb559c4348b4711298e536367041e8ca0cf0800c0126c2588c48bf5713daa8846cb026e9e5c8276ec82b3bff,
                0xb2962fe57a3225e8137e629bff2991f6f89416f5a718cd1fca64e00b11aceacd6a3d0967c94fedcfcc239ba5cb83e19,
                0x3425581a58ae2fec83aafef7c40eb545b08243f16b1655154cca8abc28d6fd04976d5243eecf5c4130de8938dc62cd8,
                0x13a8e162022914a80a6f1d5f43e7a07dffdfc759a12062bb8d6b44e833b306da9bd29ba81f35781d539d395b3532a21e,
                0xe7355f8e4e667b955390f7f0506c6e9395735e9ce9cad4d0a43bcef24b8982f7400d24bc4228f11c02df9a29f6304a5,
                0x772caacf16936190f3e0c63e0596721570f5799af53a1894e2e073062aede9cea73b3538f0de06cec2574496ee84a3a,
                0x14a7ac2a9d64a8b230b3f5b074cf01996e7f63c21bca68a81996e1cdf9822c580fa5b9489d11e2d311f7d99bbdcc5a5e,
                0xa10ecf6ada54f825e920b3dafc7a3cce07f8d1d7161366b74100da67f39883503826692abba43704776ec3a79a1d641,
                0x95fc13ab9e92ad4476d6e3eb3a56680f682b4ee96f7d03776df533978f31c1593174e4b4b7865002d6384d168ecdd0a,
                0x1,
            ],
            [
                0x10f37a221ddd97ba257e88acf9cacfdd52ca37f6aadca96d3bde2334614bb250519f851016185c3cfb66ba8e68f7ef78,
                0x6b77b4934918e88760b70decc50665452536218ce35da8257a06f5d0b4948ef47e698ed1b24573fd96718a5d1bde415,
                0x1934997e8ee97833567822edd91063433f2468ae9ae1f5dca3ec14556570e87c4c3eade888a3fadc011f1dbf38d1c8b5,
                0x1808ae7350e7ca78d283329b6ad7457f904ca3cbe49999a35d4c2eb4f38bd92a406ba544128de21313c9a3884f19b5e0,
                0x11350dec499ee786ee6c57d3a13683134b2214890fb6c206edad92ced57bdb47efc40722a7c3bf57784825130d16abd0,
                0x3a0d21ff91c9b302909c6988a5b0636efcf7ab043d75b01f0e07663bbdba1d5fe6c9cd7e7f97f8d204cc54ec9cc04bb,
                0x1556064e69d3cadd98522fe61bd2419a7d1b92bac7a38df414ff9164a94da6ecd703853c6b44bea0f09d077aa015d3b9,
                0x1079491506452e2a6c8280f916a4e6634d6d45c50fc73a9f6a2d44fa344471fddbb5baadb27416ca18a0b35ce78eaf82,
                0x1004d1d17be97e4e628f099424fe0b1bd53c8e6e8be7505348a56436d7902b65b4d5adfce9cdf85c59c7f1a884240524,
                0xbe5577027f928e528e0e9ce95aa62b3a04d3edd622a1bc16098742224cc21e8836c8fa8d40545908e4f5514358c8e7b,
                0x8fd3a2a60314dc3d1e9c272607b14397477fb986d5c97f9618945f93271013ececc5a1e3144502d1eb8ee52fede979,
                0x14ca759aa48efbb9202e6724478bf0b1241f1cc4894507938c4d421659191f1d4d2320a960f29f8ebf7375b2ff85d1d,
                0xee8e53e2964530079c69e563e566d92e9cf9a5abf5e6230a709c1b8eefc92e517e3ae3d1fc1ee0dacb2fb0ff4688bb3,
                0x17bb6e558c611bfed81fa707c76896faeefc107ce638fd3f534a6f73ba70908757dc6f519530d59b77252c0a2467a978,
                0x143fe885db3b1789487a4dbefa8708db06100e031b9cad568d85c343bd46793fb30afb634bda50483393e18eab8a8860,
                0x41a539ba070e2cbfc769c7b006c7e21995f2df56eeeb8860f82fda66101f4716846fd7fb293e388b54aa9419636f4a7,
            ],
            [
                0x16112c4c3a9c98b252181140fad0eae9601a6de578980be6eec3232b5be72e7a07f3688ef60c206d01479253b03663c1,
                0x1962d75c2381201e1a0cbd6c43c348b885c84ff731c4d59ca4a10356f453e01f78a4260763529e3532f6102c2e49a03d,
                0x58df3306640da276faaae7d6e8eb15778c4855551ae7f310c35a5dd279cd2eca6757cd636f96f891e2538b53dbf67f2,
                0x16b7d288798e5395f20d23bf89edb4d1d115c5dbddbcd30e123da489e726af41727364f2c28297ada8d26d98445f5416,
                0xbe0e079545f43e4b00cc912f8228ddcc6d19c9f0f69bbb0542eda0fc9dec916a20b15dc0fd2ededda39142311a5001d,
                0x8d9e5297186db2d9fb266eaac783182b70152c65550d881c5ecd87b6f0f5a6449f38db9dfa9cce202c6477faaf9b7ac,
                0x166007c08a99db2fc3ba8734ace9824b5eecfdfa8d0cf8ef5dd365bc400a0051d5fa9c01a58b1fb93d1a1399126a775c,
                0x16a3ef08be3ea7ea03bcddfabba6ff6ee5a4375efa1f4fd7feb34fd206357132b920f5b00801dee460ee415a15812ed9,
                0x1866c8ed336c61231a1be54fd1d74cc4f9fb0ce4c6af5920abc5750c4bf39b4852cfe2f7bb9248836b233d9d55535d4a,
                0x167a55cda70a6e1cea820597d94a84903216f763e13d87bb5308592e7ea7d4fbc7385ea3d529b35e346ef48bb8913f55,
                0x4d2f259eea405bd48f010a01ad2911d9c6dd039bb61a6290e591b36e636a5c871a5c29f4f83060400f8b49cba8f6aa8,
                0xaccbb67481d033ff5852c1e48c50c477f94ff8aefce42d28c0f9a88cea7913516f968986f7ebbea9684b529e2561092,
                0xad6b9514c767fe3c3613144b45f1496543346d98adf02267d5ceef9a00d9b8693000763e3b90ac11e99b138573345cc,
                0x2660400eb2e4f3b628bdd0d53cd76f2bf565b94e72927c1cb748df27942480e420517bd8714cc80d1fadc1326ed06f7,
                0xe0fa1d816ddc03e6b24255e0d7819c171c40f65e273b853324efcd6356caa205ca2f570f13497804415473a1d634b8f,
                0x1,
            ],
        ),
    },
}

G2 = {
    "BLS12_381": {
        "A": (0x0, 0xf0),
        "B": (0x3f4, 0x3f4),
        "Z": (-2, -1),  # RFC 9380 8.8.2: Z = -(2 + u)
        "h_eff": 0xbc69f08f2ee75b3584c6a0ea91b352888e2a8e9145ad7689986ff031508ffe1329c2f178731db956d82bf015d1212b02ec0ec69d7477c1ae954cbc06689f6a359894c0adebbf6b4e8020005aaa95551,
        "iso": (
            [
                # x_num scaled by the codomain automorphism (x,y)->(w*x,y),
                # w^3=1, fixing the dual-isogeny normalization so the map
                # equals the RFC 9380 E.3 published 3-isogeny exactly
                # (pinned by the J.10.1 vectors in tests/test_hash_vectors.py).
                (0x5c759507e8e333ebb5b7a9a47d7ed8532c52d39fd3a042a88b58423c50ae15d5c2638e343d9c71c6238aaaaaaaa97d6, 0x5c759507e8e333ebb5b7a9a47d7ed8532c52d39fd3a042a88b58423c50ae15d5c2638e343d9c71c6238aaaaaaaa97d6),
                (0x0, 0x11560bf17baa99bc32126fced787c88f984f87adf7ae0c7f9a208c6b4f20a4181472aaa9cb8d555526a9ffffffffc71a),
                (0x11560bf17baa99bc32126fced787c88f984f87adf7ae0c7f9a208c6b4f20a4181472aaa9cb8d555526a9ffffffffc71e, 0x8ab05f8bdd54cde190937e76bc3e447cc27c3d6fbd7063fcd104635a790520c0a395554e5c6aaaa9354ffffffffe38d),
                (0x171d6541fa38ccfaed6dea691f5fb614cb14b4e7f4e810aa22d6108f142b85757098e38d0f671c7188e2aaaaaaaa5ed1, 0x0),
            ],
            [
                (0x0, 0x1a0111ea397fe69a4b1ba7b6434bacd764774b84f38512bf6730d2a0f6b0f6241eabfffeb153ffffb9feffffffffaa63),
                (0xc, 0x1a0111ea397fe69a4b1ba7b6434bacd764774b84f38512bf6730d2a0f6b0f6241eabfffeb153ffffb9feffffffffaa9f),
                (0x1, 0x0),
            ],
            [
                (0x1530477c7ab4113b59a4c18b076d11930f7da5d4a07f649bf54439d87d27e500fc8c25ebf8c92f6812cfc71c71c6d706, 0x1530477c7ab4113b59a4c18b076d11930f7da5d4a07f649bf54439d87d27e500fc8c25ebf8c92f6812cfc71c71c6d706),
                (0x0, 0x5c759507e8e333ebb5b7a9a47d7ed8532c52d39fd3a042a88b58423c50ae15d5c2638e343d9c71c6238aaaaaaaa97be),
                (0x11560bf17baa99bc32126fced787c88f984f87adf7ae0c7f9a208c6b4f20a4181472aaa9cb8d555526a9ffffffffc71c, 0x8ab05f8bdd54cde190937e76bc3e447cc27c3d6fbd7063fcd104635a790520c0a395554e5c6aaaa9354ffffffffe38f),
                (0x124c9ad43b6cf79bfbf7043de3811ad0761b0f37a1e26286b0e977c69aa274524e79097a56dc4bd9e1b371c71c718b10, 0x0),
            ],
            [
                (0x1a0111ea397fe69a4b1ba7b6434bacd764774b84f38512bf6730d2a0f6b0f6241eabfffeb153ffffb9feffffffffa8fb, 0x1a0111ea397fe69a4b1ba7b6434bacd764774b84f38512bf6730d2a0f6b0f6241eabfffeb153ffffb9feffffffffa8fb),
                (0x0, 0x1a0111ea397fe69a4b1ba7b6434bacd764774b84f38512bf6730d2a0f6b0f6241eabfffeb153ffffb9feffffffffa9d3),
                (0x12, 0x1a0111ea397fe69a4b1ba7b6434bacd764774b84f38512bf6730d2a0f6b0f6241eabfffeb153ffffb9feffffffffaa99),
                (0x1, 0x0),
            ],
        ),
    },
}
